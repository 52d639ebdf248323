"""global_ordinals must equal the single-reducer global row_number exactly."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_process_spark.operators.ordinals import global_ordinals


def _reference(df, order_cols):
    w = Window.orderBy(*order_cols)
    return df.withColumn("ordinal", F.row_number().over(w).cast("long"))


def test_matches_global_window_with_ties_and_empty_buckets(spark):
    rng = random.Random(7)
    # Heavy ties on the leading key; key space leaves some buckets empty.
    rows = [(i, rng.choice([0, 5, 5, 17, 40, 41, 99])) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, score long")
    got = global_ordinals(
        df,
        order_by=[F.col("score"), F.col("id")],
        bucket=F.expr("score div 10"),
    )
    want = _reference(df, [F.col("score"), F.col("id")])
    assert got.orderBy("ordinal").collect() == want.orderBy("ordinal").collect()


def test_ordinals_are_contiguous_from_one(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 37 % 100).alias("score")
    )
    got = global_ordinals(
        df,
        order_by=[F.col("score"), F.col("id")],
        bucket=F.expr("score div 7"),
    )
    ords = [r.ordinal for r in got.select("ordinal").orderBy("ordinal").collect()]
    assert ords == list(range(1, 1001))


def test_plan_has_no_corpus_sized_single_partition_window(spark):
    """The only Window.orderBy-without-partition runs over the tiny
    per-bucket counts table, not the input: the input-side window must be
    partitioned by bucket."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("score")
    )
    got = global_ordinals(
        df, order_by=[F.col("score"), F.col("id")], bucket=F.col("score")
    )
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    # Two Window nodes total: the offsets cumsum (over counts) and the
    # per-bucket row_number (partitioned).
    assert plan.count("Window") == 2
    assert "row_number" in plan


def test_ntile_from_global_rank_arithmetic_matches_spec():
    """price_equidepth_histogram derives ntile(8) from the global row
    number with integer arithmetic (q = n div 8, r = n % 8: buckets
    1..r hold q+1 rows, r+1..8 hold q). Property-check the formula
    against the ntile definition for every n up to 200 and spot sizes
    beyond — pure Python, no session needed, pins the arithmetic the
    oracle hash-verifies at two scale factors."""

    def bucket(rn: int, n: int, b: int = 8) -> int:
        q, r = divmod(n, b)
        if rn <= r * (q + 1):
            return (rn + q) // (q + 1)
        return r + (rn - r * (q + 1) + q - 1) // q

    def ntile_spec(n: int, b: int = 8) -> list[int]:
        q, r = divmod(n, b)
        out = []
        for i in range(1, b + 1):
            out.extend([i] * (q + 1 if i <= r else q))
        return out

    for n in [*range(1, 201), 999, 1000, 1500, 59999, 60001]:
        spec = ntile_spec(n)
        got = [bucket(rn, n) for rn in range(1, n + 1)]
        assert got == spec, f"n={n}"
