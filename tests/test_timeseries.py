"""Resample + interpolate: hand-computed boundary semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_process_spark.operators.timeseries import resample_interpolate


def test_interpolation_boundaries(spark):
    rows = [
        # key 1: obs at 03:00 (v=10) and 09:00 (v=40); grid 00:00,06:00...
        (1, dt.datetime(2024, 1, 1, 3, 0, 0), 10.0),
        (1, dt.datetime(2024, 1, 1, 9, 0, 0), 40.0),
        # key 2: single obs exactly on a grid point
        (2, dt.datetime(2024, 1, 2, 6, 0, 0), 7.0),
        # key 2: duplicate-ts observations are averaged (7+9)/2 = 8
        (2, dt.datetime(2024, 1, 2, 6, 0, 0), 9.0),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, value double")
    out = {
        (r["k"], r["grid_ts"]): r["value_interp_e6"]
        for r in resample_interpolate(df, "k", "ts", F.col("value"), "6 hours").collect()
    }
    # before first obs -> NULL
    assert out[(1, dt.datetime(2024, 1, 1, 0, 0, 0))] is None
    # 06:00 sits halfway between 03:00(10) and 09:00(40) -> 25 (e6 units)
    assert out[(1, dt.datetime(2024, 1, 1, 6, 0, 0))] == 25_000_000
    # grid exactly on the (averaged) observation -> its value
    assert out[(2, dt.datetime(2024, 1, 2, 6, 0, 0))] == 8_000_000
    # grid covers [midnight, last obs]: key 1 has 00:00 and 06:00 only
    assert set(k for k in out) == {
        (1, dt.datetime(2024, 1, 1, 0, 0, 0)),
        (1, dt.datetime(2024, 1, 1, 6, 0, 0)),
        (2, dt.datetime(2024, 1, 2, 0, 0, 0)),
        (2, dt.datetime(2024, 1, 2, 6, 0, 0)),
    }
