"""Lane-min distinct sketch (`operators/sketch.py`): merge identity,
estimator accuracy in both regimes, and the empty-set edge."""

from pyspark.sql import functions as F

from etl_process_spark.operators.sketch import (
    LANES,
    lane_min_estimate,
    lane_min_merge,
    lane_min_sketch,
    lane_union,
)


def _ids(spark, n, label, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("k"), F.lit(label).alias("s")
    )


def test_shard_merge_equals_whole_sketch(spark):
    whole = _ids(spark, 500, "a")
    sh1, sh2 = whole.where("k % 2 = 0"), whole.where("k % 2 = 1")
    sk_whole = lane_min_sketch(whole, F.col("k"), F.col("s"))
    merged = lane_min_merge(
        lane_min_sketch(sh1, F.col("k"), F.col("s")),
        lane_min_sketch(sh2, F.col("k"), F.col("s")),
    )
    assert sorted(map(tuple, sk_whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_estimator_accuracy_both_regimes(spark):
    # sparse (linear counting) and dense (lane-sum) regimes
    for n in (30, 150, 5000):
        df = _ids(spark, n, "x")
        est = lane_min_estimate(
            lane_min_sketch(df, F.col("k"), F.col("s"))
        ).collect()[0]["est"]
        assert abs(est - n) <= max(0.5 * n, 20), (n, est)


def test_union_and_overlap_shape(spark):
    a = _ids(spark, 300, "a")            # 0..299
    b = _ids(spark, 300, "b", start=200)  # 200..499, overlap 100
    sk = lane_min_sketch(a.unionByName(b), F.col("k"), F.col("s"))
    est = {
        r["set"]: r["est"]
        for r in lane_min_estimate(
            sk.unionByName(lane_union(sk, "u"))
        ).collect()
    }
    overlap = est["a"] + est["b"] - est["u"]
    assert abs(est["u"] - 500) <= 250
    assert abs(overlap - 100) <= 120  # ~1/sqrt(64) noise on each term


def test_duplicates_do_not_move_estimate(spark):
    base = _ids(spark, 400, "d")
    dup = base.unionByName(base).unionByName(base)
    e1 = lane_min_estimate(
        lane_min_sketch(base, F.col("k"), F.col("s"))
    ).collect()[0]["est"]
    e2 = lane_min_estimate(
        lane_min_sketch(dup, F.col("k"), F.col("s"))
    ).collect()[0]["est"]
    assert e1 == e2
