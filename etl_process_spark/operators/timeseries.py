"""Time-series regularization: resample onto a fixed grid with linear
interpolation between surrounding observations.

Irregular event streams (sensor pings, price ticks) feed models that
want fixed-step inputs. The naive plan — per grid point, scan for the
nearest observation on each side — is a range join per direction. This
operator does it in ONE shuffle: union the grid rows into the
observation stream, sort each key once by (ts, kind), and recover the
surrounding observations with two frame-bounded window functions
(running last for the predecessor, forward first for the successor) —
the same union-merge trick as ``operators/asof.py::asof_join_merge``,
applied in both directions simultaneously.

Per-key work is O(n log n) in observations + grid points; state never
exceeds one partition's sort — no per-grid-point probing, no range
join, no UDF. Interpolation arithmetic runs on exact integer epoch
micros and IEEE doubles in a fixed operation order, so results are
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_interpolate(
    df: DataFrame,
    key: str,
    ts_col: str,
    val_col: Column,
    step: str = "6 hours",
) -> DataFrame:
    """Per ``key``: build a time grid from midnight-of-first-observation
    to the last observation at ``step`` intervals, and linearly
    interpolate ``val_col`` at each grid point.

    Grid points outside the observation range (before the first
    observation) yield NULL. Multiple observations on one timestamp are
    averaged first (exact decimal mean), making the input to
    interpolation a function of time. Returns
    ``(key, grid_ts, value_interp)``.
    """
    # exact decimal sum, double-cast, ONE division — avg(decimal) takes
    # engine-specific decimal rescaling paths (Spark divides in decimal
    # with HALF_UP, DuckDB in double) and can differ at the last ulp
    obs = df.groupBy(key, ts_col).agg(
        (
            F.sum(val_col.cast("decimal(12,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )
    bounds = obs.groupBy(key).agg(
        F.date_trunc("day", F.min(ts_col)).alias("lo"), F.max(ts_col).alias("hi")
    )
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr(f"INTERVAL {step}"))
        ).alias(ts_col),
    )
    u = obs.select(key, ts_col, "v", F.lit(1).alias("is_obs")).unionByName(
        grid.select(key, ts_col, F.lit(None).cast("double").alias("v"),
                    F.lit(0).alias("is_obs"))
    )
    # one sort serves both directions; obs sorts BEFORE its grid twin at
    # an identical ts, so the predecessor search is inclusive and the
    # successor search strict (the tp == t case is the den-zero guard)
    order = [F.col(ts_col).asc(), F.col("is_obs").desc()]
    w_prev = (
        Window.partitionBy(key).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key).orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    point = F.when(
        F.col("is_obs") == 1,
        F.struct(F.unix_micros(F.col(ts_col)).alias("t"), F.col("v").alias("v")),
    )
    filled = (
        u.withColumn("prev", F.last(point, ignorenulls=True).over(w_prev))
        .withColumn("nxt", F.first(point, ignorenulls=True).over(w_next))
        .filter(F.col("is_obs") == 0)
    )
    t = F.unix_micros(F.col(ts_col))
    interp = (
        # exact hit first: a grid point ON an observation takes its value
        # even at the series tail where no successor exists
        F.when(F.col("prev").isNotNull() & (F.col("prev.t") == t), F.col("prev.v"))
        .when(F.col("prev").isNull() | F.col("nxt").isNull(), F.lit(None))
        .when(F.col("nxt.t") == F.col("prev.t"), F.col("prev.v"))
        .otherwise(
            F.col("prev.v")
            + (F.col("nxt.v") - F.col("prev.v"))
            * ((t - F.col("prev.t")).cast("double") / (F.col("nxt.t") - F.col("prev.t")))
        )
    )
    return filled.select(
        key,
        F.col(ts_col).alias("grid_ts"),
        # fixed-point boundary: floor of one multiply on the identical
        # double both engines derive — exact, unlike round(DOUBLE, 6)
        F.floor(interp * F.lit(1000000.0)).cast("long").alias("value_interp_e6"),
    )
