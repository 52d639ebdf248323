"""The scale-bench corpus builder's decorrelation transforms
(tools/bench_scale.py): replication must scale the WORKLOAD linearly
without multiplying the near-dup structure across replicas — these pin
the properties that argument rests on.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, n=40):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(n)


def test_cipher_preserves_structure_but_not_shingles(spark):
    from bench_scale import _cipher

    docs = _docs(spark)
    out = docs.select(
        "doc_id",
        F.col("text").alias("orig"),
        _cipher(F.col("text"), 1).alias("c1"),
        _cipher(F.col("text"), 0).alias("c0"),
    ).collect()
    for r in out:
        assert r.c0 == r.orig                       # replica 0 = identity
        assert len(r.c1) == len(r.orig)             # lengths exact
        assert r.c1 != r.orig or not any(ch.isalpha() for ch in r.orig)
        # word boundaries (whitespace positions) are untouched
        assert [i for i, ch in enumerate(r.orig) if ch.isspace()] == [
            i for i, ch in enumerate(r.c1) if ch.isspace()
        ]
        # within-replica equality structure is preserved: same cipher on
        # equal words gives equal words (substitution is a bijection)
        w_orig = r.orig.split()
        w_c1 = r.c1.split()
        assert len(w_orig) == len(w_c1)
        for a, b, c, d in zip(w_orig, w_orig[1:], w_c1, w_c1[1:]):
            assert (a == b) == (c == d)


def test_cipher_is_bijective_per_replica(spark):
    from bench_scale import LOWER, UPPER, _cipher

    docs = _docs(spark, 5)
    # applying the inverse rotation recovers the original exactly
    for i in (1, 3, 7):
        rot = (5 * i) % 26
        inv_to = LOWER[-rot:] + LOWER[:-rot] + UPPER[-rot:] + UPPER[:-rot]
        out = docs.select(
            F.col("text").alias("orig"),
            F.translate(
                _cipher(F.col("text"), i), LOWER + UPPER, inv_to
            ).alias("back"),
        ).collect()
        for r in out:
            assert r.back == r.orig


def test_vector_rotation_preserves_norm_and_multiset(spark):
    import math

    from bench_scale import _rotate_vec

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(20)
    out = emb.select(
        F.col("embedding").alias("orig"),
        _rotate_vec(F.col("embedding"), 3).alias("rot"),
    ).collect()
    for r in out:
        assert len(r.rot) == len(r.orig) == 64
        assert sorted(r.orig) == sorted(r.rot)       # value multiset
        n1 = math.sqrt(sum(x * x for x in r.orig))
        n2 = math.sqrt(sum(x * x for x in r.rot))
        assert abs(n1 - n2) < 1e-9
        s = (7 * 3) % 64
        assert list(r.rot) == list(r.orig)[s:] + list(r.orig)[:s]


def test_replica_key_spaces_are_disjoint(spark):
    from bench_scale import GAPS, _replica

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    r0 = _replica("documents", docs, 0)
    r1 = _replica("documents", docs, 1)
    ids0 = {r.doc_id for r in r0.select("doc_id").collect()}
    ids1 = {r.doc_id for r in r1.select("doc_id").collect()}
    assert not ids0 & ids1
    assert ids1 == {i + GAPS["doc"] for i in ids0}
    # gid parity preserved (pair-group queries keep their structure)
    assert GAPS["doc"] % 2 == 0


def test_wide_cipher_expr_matches_literal_form(spark):
    """_cipher_wide_expr (codepoint arithmetic over a replica COLUMN,
    used by the crossJoin-replicated 100x builder) must produce the
    byte-identical text _cipher_wide (translate with a literal replica)
    produces, for replicas across the full 130-period including ones
    past the 26-letter cycle."""
    from bench_scale import _cipher_wide, _cipher_wide_expr

    docs = _docs(spark, 15)
    for i in (0, 1, 13, 26, 27, 64, 99):
        out = docs.select(
            _cipher_wide(F.col("text"), i).alias("lit"),
            _cipher_wide_expr(F.col("text"), F.lit(i)).alias("expr"),
        ).collect()
        for r in out:
            assert r.lit == r.expr, f"replica {i} diverged"


def test_wide_cipher_decorrelates_past_26_replicas(spark):
    """Replicas 0 and 26 share the letter rotation — the 10x cipher
    would make them exact twins; the wide cipher must not (digits
    differ), and any two replicas below 100 must differ for text
    containing at least one digit and one letter."""
    from bench_scale import _cipher_wide

    row = _docs(spark, 1).select(
        F.lit("Quarter 3 revenue grew 12 percent").alias("text")
    )
    texts = {}
    for i in (0, 10, 26, 52, 78, 99):
        texts[i] = row.select(_cipher_wide(F.col("text"), i)).first()[0]
    vals = list(texts.values())
    assert len(set(vals)) == len(vals), "wide cipher collided below 100"


def test_rotate_vec_expr_matches_literal_form(spark):
    from bench_scale import _rotate_vec, _rotate_vec_expr

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(10)
    for i in (0, 1, 9, 64, 65, 99):
        out = emb.select(
            _rotate_vec(F.col("embedding"), i).alias("lit"),
            _rotate_vec_expr(F.col("embedding"), F.lit(i)).alias("expr"),
        ).collect()
        for r in out:
            assert list(r.lit) == list(r.expr), f"replica {i} diverged"


def test_family_tier_matches_100x_correctness_set():
    """The family tier times EXACTLY the query set the 100x differential
    proved correct — if CORRECTNESS_100X.json gains or loses a query,
    this fails until FAMILY_100X (tools/bench_scale.py) is updated, so
    the correctness and cost-growth artifacts can never silently cover
    different families."""
    import json
    from pathlib import Path

    from bench_scale import FAMILY_100X

    artifact = Path(__file__).resolve().parent.parent / "CORRECTNESS_100X.json"
    proven = set(json.loads(artifact.read_text())["results"])
    assert set(FAMILY_100X) == proven, (
        sorted(set(FAMILY_100X) ^ proven))
