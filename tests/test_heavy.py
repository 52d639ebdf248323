"""Heavy hitters: exact results at every legal capacity — requested
capacities below the ceil(1/min_frac) completeness floor are clamped
up, so even capacity=2 requests return exact answers."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_process_spark.operators.heavy import heavy_hitters


def _exact(df, key_cols, min_frac):
    n = df.count()
    thr = math.ceil(min_frac * n)
    return {
        tuple(r[c] for c in key_cols) + (r["cnt"],)
        for r in df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thr)
        .collect()
    }


@pytest.fixture(scope="module")
def skewed(spark):
    # zipf-ish: key k appears ~1000/k times -> few heavy keys, long tail
    df = (
        spark.range(0, 3000)
        .select(
            (F.floor(1000 / (F.col("id") % 999 + 1))).cast("long").alias("k"),
            (F.col("id") % 3).cast("string").alias("g"),
        )
        .repartition(8)
        .localCheckpoint()
    )
    return df


@pytest.mark.parametrize("capacity", [2, 8, 64])
def test_matches_exact_groupby_any_capacity(spark, skewed, capacity):
    got = {
        (r["k"], r["cnt"])
        for r in heavy_hitters(skewed, ["k"], 0.05, capacity=capacity).collect()
    }
    assert got == _exact(skewed, ["k"], 0.05)
    assert got, "fixture must contain at least one heavy hitter"


def test_multi_key_and_threshold_boundary(spark):
    rows = [("a", "x")] * 10 + [("b", "y")] * 5 + [("c", None)] * 5
    df = spark.createDataFrame(rows, "k1 string, k2 string").repartition(4)
    # N=20, min_frac=0.25 -> threshold 5: all three groups qualify,
    # including the NULL-key tuple (null-safe verify join)
    got = {
        (r["k1"], r["k2"], r["cnt"])
        for r in heavy_hitters(df, ["k1", "k2"], 0.25, capacity=2).collect()
    }
    assert got == {("a", "x", 10), ("b", "y", 5), ("c", None, 5)}
    # threshold 6: only the 10-row group stays
    got6 = {
        (r["k1"], r["k2"], r["cnt"])
        for r in heavy_hitters(df, ["k1", "k2"], 0.3, capacity=2).collect()
    }
    assert got6 == {("a", "x", 10)}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    data=st.lists(st.integers(0, 12), min_size=1, max_size=200),
    min_frac=st.sampled_from([0.05, 0.1, 0.25, 0.5]),
    capacity=st.sampled_from([1, 3, 30]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_heavy_hitters_property(spark, data, min_frac, capacity):
    """Random multisets: heavy_hitters == exact GROUP BY ... HAVING for
    every (data, threshold, capacity) combination — including capacities
    below the completeness floor, which must be clamped, not wrong."""
    df = spark.createDataFrame([(v,) for v in data], "k long").repartition(4)
    got = {
        (r["k"], r["cnt"])
        for r in heavy_hitters(df, ["k"], min_frac, capacity=capacity).collect()
    }
    thr = math.ceil(min_frac * len(data))
    from collections import Counter

    exp = {(k, c) for k, c in Counter(data).items() if c >= thr}
    assert got == exp
