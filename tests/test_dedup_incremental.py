"""Incremental dedup differentials against full-corpus recompute.

Exact dedup is associative, so batch-at-a-time application through the
fingerprint index must reproduce the one-shot keep-set EXACTLY. LSH
bucket collision is pairwise (no transitivity), so probing a stored band
index with a new batch must surface EXACTLY the full-corpus candidate
pairs that touch the batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_process_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_incremental,
    fingerprint_index,
    lsh_band_index,
    lsh_candidate_pairs,
    lsh_probe_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    # Plant duplicates across the batch boundary: copies of early docs with
    # high ids (land in the second batch), plus an in-batch duplicate pair.
    clones = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    clone_pair = base.filter(F.col("doc_id") == 7).select(
        (F.col("doc_id") + 20_000).alias("doc_id"), "text"
    )
    return base.unionByName(clones).unionByName(clone_pair).cache()


def test_exact_incremental_equals_full_recompute(spark, docs):
    full_keep = {
        r["keep_id"] for r in exact_dedup(docs, "text", "doc_id").collect()
    }

    split = 250
    b1 = docs.filter(F.col("doc_id") < split)
    b2 = docs.filter(F.col("doc_id") >= split)
    empty_index = fingerprint_index(b1.limit(0), "text", "doc_id")
    kept1, idx = exact_dedup_incremental(empty_index, b1, "text", "doc_id")
    kept2, idx = exact_dedup_incremental(idx, b2, "text", "doc_id")
    inc_keep = {r["doc_id"] for r in kept1.collect()} | {
        r["doc_id"] for r in kept2.collect()
    }
    assert inc_keep == full_keep
    # the planted cross-batch clones were dropped in batch 2
    assert not any(k >= 10_000 for k in inc_keep)
    # index covers every distinct text exactly once
    assert idx.count() == docs.select("text").distinct().count()


def test_lsh_probe_equals_full_pairs_touching_batch(spark, docs):
    split = 250
    corpus = docs.filter(F.col("doc_id") < split)
    batch = docs.filter(F.col("doc_id") >= split)
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}

    full_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(docs, "text", "doc_id").collect()
    }
    expected = {
        p for p in full_pairs if p[0] in batch_ids or p[1] in batch_ids
    }

    idx = lsh_band_index(corpus, "text", "doc_id")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_probe_pairs(idx, batch, "text", "doc_id").collect()
    }
    assert got == expected
    # the planted clones guarantee cross pairs exist — not vacuous
    assert any(a < split <= b for a, b in got)


def _naive_jaccard_pairs(texts: dict[int, str], num=3, den=5):
    """Trusted answer: exact Jaccard over ALL pairs of 3-shingle sets."""
    import itertools

    def sh(t):
        w = t.lower().split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sets = {k: sh(v) for k, v in texts.items() if len(sh(v)) > 0}
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if den * i >= num * u:
            out.add((a, b, (1000000 * i) // u))
    return out


def test_allpairs_jaccard_complete_vs_naive(spark):
    """Prefix filtering must find EVERY pair at Jaccard >= 3/5 — the
    completeness guarantee LSH banding cannot make. Docs include exact
    dups, a one-word edit, a half-overlap pair (below threshold), and
    unrelated text."""
    from etl_process_spark.operators.dedup import allpairs_jaccard

    texts = {
        1: "the quick brown fox jumps over the lazy dog today",
        2: "the quick brown fox jumps over the lazy dog today",
        3: "the quick brown fox jumps over the lazy cat today",
        4: "the quick brown fox sleeps all day long in the sun",
        5: "completely different words about spark shuffles and joins",
        6: "completely different words about spark shuffles and joins",
        7: "short text",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard_ppm"])
        for r in allpairs_jaccard(df, "text", "doc_id").collect()
    }
    expected = _naive_jaccard_pairs(texts)
    assert got == expected
    assert (1, 2, 1000000) in got and (5, 6, 1000000) in got  # exact dups found
    assert any(a == 1 and b == 3 for a, b, _ in got)  # near-dup found


def test_allpairs_probe_equals_full_pairs_touching_batch(spark, docs):
    """The AllPairs probe under the FROZEN index-time order must yield
    EXACTLY the full-recompute verified pairs touching the batch: the
    two runs' candidate sets differ (different df orders), but prefix
    completeness holds under ANY shared total order and verification is
    exact, so the verified pairs coincide."""
    from etl_process_spark.operators.dedup import (
        allpairs_index,
        allpairs_jaccard,
        allpairs_probe,
    )

    split = 250
    corpus = docs.filter(F.col("doc_id") < split)
    batch = docs.filter(F.col("doc_id") >= split)
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}

    full = {
        (r["doc_a"], r["doc_b"], r["jaccard_ppm"])
        for r in allpairs_jaccard(docs, "text", "doc_id").collect()
    }
    expected = {
        p for p in full if p[0] in batch_ids or p[1] in batch_ids
    }

    idx = allpairs_index(corpus, "text", "doc_id")
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard_ppm"])
        for r in allpairs_probe(idx, batch, "text", "doc_id").collect()
    }
    assert got == expected
    # planted clones guarantee cross pairs — not vacuous
    assert any(a < split <= b for a, b, _ in got)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_allpairs_jaccard_random_corpora(spark, seed):
    """Randomized completeness+exactness: word-soup corpora from a tiny
    vocabulary (adversarially collision-heavy for prefix filtering —
    every shingle is common) must still match the naive all-pairs
    answer exactly."""
    import random

    from etl_process_spark.operators.dedup import allpairs_jaccard

    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = {}
    for i in range(24):
        n = rng.randint(3, 12)
        texts[i] = " ".join(rng.choice(vocab) for _ in range(n))
    # planted exact duplicate + one-token edit
    texts[100] = texts[0]
    texts[101] = texts[1].replace(texts[1].split()[0], "omega", 1)

    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard_ppm"])
        for r in allpairs_jaccard(df, "text", "doc_id").collect()
    }
    assert got == _naive_jaccard_pairs(texts)
    assert any((a, b) == (0, 100) for a, b, _ in got)
