"""Salted aggregation: exact semantics, distributed hot keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_process_spark.operators.skew import salted_agg


def test_salted_agg_matches_plain_groupby(spark):
    # one pathologically hot key + a cold key
    rows = [(i, "hot" if i % 10 else "cold", float(i % 7)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    salted = salted_agg(
        df, ["k"],
        [("count", "id", "n"), ("sum", "v", "total"), ("max", "v", "mx")],
        salt_col="id", n_salts=8,
    )
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx")
    )
    canon = lambda d: sorted(tuple(r) for r in d.collect())  # noqa: E731
    assert canon(salted) == canon(plain)


def test_salted_agg_rejects_non_algebraic(spark):
    df = spark.createDataFrame([(1, "a", 1.0)], "id long, k string, v double")
    with pytest.raises(ValueError, match="not algebraic"):
        salted_agg(df, ["k"], [("avg", "v", "m")], salt_col="id")


def test_salt_lanes_are_deterministic(spark):
    df = spark.createDataFrame([(i, "k", 1.0) for i in range(100)], "id long, k string, v double")
    a = salted_agg(df, ["k"], [("count", "id", "n")], salt_col="id").first()
    b = salted_agg(df, ["k"], [("count", "id", "n")], salt_col="id").first()
    assert a == b and a["n"] == 100
