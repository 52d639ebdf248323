"""Interval-overlap join: binned rewrite ≡ naive theta join.

The naive cross-filter is the trusted (but unscalable) definition of
overlap; the binned equi-join must reproduce it exactly for any bin width,
including widths much smaller and much larger than the intervals.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_process_spark.operators.intervals import interval_overlap_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def interval_data(spark):
    left = spark.createDataFrame(
        [
            ("u1", 1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            ("u1", 2, _ts("2024-01-01 12:00:00"), _ts("2024-01-01 12:30:00")),
            ("u2", 3, _ts("2024-01-01 10:15:00"), _ts("2024-01-01 10:45:00")),
            ("u2", 4, _ts("2024-01-02 00:00:00"), _ts("2024-01-02 00:00:01")),
            ("u3", 5, _ts("2024-01-01 10:00:00"), _ts("2024-01-03 10:00:00")),
        ],
        "user string, lid long, l_start timestamp, l_end timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", 10, _ts("2024-01-01 10:30:00"), _ts("2024-01-01 10:40:00")),
            ("u1", 11, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 11:30:00")),  # touches 1
            ("u1", 12, _ts("2024-01-01 12:29:59"), _ts("2024-01-01 13:00:00")),
            ("u2", 13, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 10:16:00")),
            ("u2", 14, _ts("2024-01-02 00:00:00"), _ts("2024-01-02 01:00:00")),
            ("u3", 15, _ts("2024-01-02 05:00:00"), _ts("2024-01-02 05:00:01")),
            ("u9", 16, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
        ],
        "user string, rid long, r_start timestamp, r_end timestamp",
    )
    return left, right


def _naive(left, right, with_key):
    cond = (F.col("l.l_start") < F.col("r.r_end")) & (
        F.col("r.r_start") < F.col("l.l_end")
    )
    if with_key:
        cond = (F.col("l.user") == F.col("r.user")) & cond
    return (
        left.alias("l")
        .join(right.alias("r"), cond, "inner")
        .select(F.col("l.lid").alias("lid"), F.col("r.rid").alias("rid"))
    )


@pytest.mark.parametrize("bin_width", [60, 3600, 86400, 7 * 86400])
def test_binned_matches_naive_keyed(spark, interval_data, bin_width):
    left, right = interval_data
    out = interval_overlap_join(
        left, right,
        left_start="l_start", left_end="l_end",
        right_start="r_start", right_end="r_end",
        on=["user"], bin_width_seconds=bin_width,
    ).select("lid", "rid")
    expect = _naive(left, right, with_key=True)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, expect.collect()))


def test_binned_matches_naive_keyless(spark, interval_data):
    left, right = interval_data
    out = interval_overlap_join(
        left.withColumnRenamed("user", "l_user"),
        right.withColumnRenamed("user", "r_user"),
        left_start="l_start", left_end="l_end",
        right_start="r_start", right_end="r_end",
        bin_width_seconds=3600,
    ).select("lid", "rid")
    expect = _naive(left, right, with_key=False)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, expect.collect()))


def test_touching_endpoints_do_not_overlap(spark, interval_data):
    left, right = interval_data
    pairs = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right,
            left_start="l_start", left_end="l_end",
            right_start="r_start", right_end="r_end",
            on=["user"], bin_width_seconds=3600,
        ).collect()
    }
    assert (1, 10) in pairs     # contained
    assert (1, 11) not in pairs  # [10,11) vs [11,11:30): touching, half-open
    assert (2, 12) in pairs     # 1-second overlap across a bin edge
    assert (4, 14) in pairs     # 1-second interval
    assert (5, 15) in pairs     # long interval spanning many bins


def test_rejects_column_clash(spark, interval_data):
    left, right = interval_data
    with pytest.raises(ValueError, match="clash"):
        interval_overlap_join(
            left, right.withColumnRenamed("r_start", "l_start"),
            left_start="l_start", left_end="l_end",
            right_start="l_start", right_end="r_end",
        )
