"""Count-Min Sketch: one-sided error, linear merge, exactness at width."""

from pyspark.sql import functions as F

from etl_process_spark.operators.sketch import cms_build, cms_estimate, cms_merge


def _exact(df):
    return df.groupBy("k").agg(F.count(F.lit(1)).alias("exact_n"))


def test_estimate_never_underestimates(spark):
    df = spark.range(2000).select((F.col("id") % 37).alias("k"))
    sk = cms_build(df, F.col("k"), w=16, d=2)  # tiny width → collisions
    est = cms_estimate(sk, _exact(df), F.col("k"), w=16, d=2)
    bad = est.where(F.col("cms_n") < F.col("exact_n")).count()
    assert bad == 0
    # tiny width must actually collide somewhere, or the test is vacuous
    assert est.where(F.col("cms_n") > F.col("exact_n")).count() > 0


def test_merge_of_disjoint_batches_equals_sketch_of_union(spark):
    a = spark.range(0, 1500).select((F.col("id") % 53).alias("k"))
    b = spark.range(1500, 2600).select((F.col("id") % 31).alias("k"))
    merged = cms_merge(
        cms_build(a, F.col("k"), w=64, d=3),
        cms_build(b, F.col("k"), w=64, d=3),
    )
    union = cms_build(a.unionByName(b), F.col("k"), w=64, d=3)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, union.collect())
    )


def test_wide_sketch_is_exact_for_sparse_keys(spark):
    df = spark.range(3000).select((F.col("id") % 11).alias("k"))
    sk = cms_build(df, F.col("k"), w=4096, d=4)
    est = cms_estimate(sk, _exact(df), F.col("k"), w=4096, d=4)
    assert est.where(F.col("cms_n") != F.col("exact_n")).count() == 0


def test_lsh_tune_meets_recall_and_minimizes_background_collisions():
    from etl_process_spark.operators.dedup import (
        lsh_collision_probability,
        lsh_tune,
    )

    for threshold, recall in [(0.6, 0.9), (0.8, 0.95), (0.3, 0.9)]:
        b, r = lsh_tune(threshold, recall, max_hashes=64)
        assert b * r <= 64
        assert lsh_collision_probability(threshold, b, r) >= recall
        # optimality: nothing within budget that meets recall has a
        # lower false-candidate probability at the background similarity
        bg = threshold / 2.0
        p_best = lsh_collision_probability(bg, b, r)
        for rr in range(1, 65):
            for bb in range(1, 64 // rr + 1):
                if lsh_collision_probability(threshold, bb, rr) >= recall:
                    assert (
                        lsh_collision_probability(bg, bb, rr) >= p_best - 1e-12
                    )


def test_lsh_tune_sharper_rows_for_higher_thresholds():
    from etl_process_spark.operators.dedup import lsh_tune

    _, r_low = lsh_tune(0.3, 0.9)
    _, r_high = lsh_tune(0.9, 0.9)
    assert r_high > r_low  # high-threshold dedup affords a sharper curve
