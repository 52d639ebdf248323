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


def test_salted_join_equals_plain_join(spark):
    """salted_join ≡ plain join for inner and left, including unmatched
    left rows and a hot key owning most of the input."""
    from etl_process_spark.operators.skew import salted_join

    large = spark.createDataFrame(
        [(i, 7 if i % 10 else i % 5, float(i)) for i in range(2000)],
        "row_id long, k long, v double",
    ).repartition(8)
    small = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(9)], "k long, label string"
    )
    for how in ("inner", "left"):
        got = salted_join(large, small, "k", salt_col="row_id", n_salts=8, how=how)
        exp = large.join(small, "k", how)
        cols = sorted(got.columns)
        assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
            map(tuple, exp.select(*cols).collect())
        ), how
