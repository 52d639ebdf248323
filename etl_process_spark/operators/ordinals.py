"""Global contiguous ordinal assignment without a single-reducer sort.

The curriculum-ordering primitive: training pipelines materialize the
corpus in a global order (easy→hard difficulty, quality-descending,
time-ascending) with a contiguous ``ordinal`` per row — semantically
``row_number() OVER (ORDER BY keys)``. Spark plans that window as ONE
partition holding the whole corpus, which is exactly the shape that dies
at 100 TB.

``global_ordinals`` produces bit-identical output from partition-local
work: the caller supplies a *range-bucket* expression that is monotone
non-decreasing along the sort order (every row of bucket i sorts before
every row of bucket i+1 — e.g. ``floor(lead_key / width)`` on the
leading sort key; equal keys land in one bucket, so boundaries never
split ties). Then

1. per-bucket row counts — a tiny aggregate (≤ n_buckets rows),
2. exclusive prefix sums over that tiny table give each bucket's global
   offset (the only "global" step, windowing n_buckets rows, not rows),
3. ``row_number`` within each bucket (``partitionBy(bucket)`` — a real
   parallel window) plus the broadcast offset.

Equality with the single-reducer window is exact, not approximate: the
bucket order refines into the row order, so offsets + local ranks ARE
the global ranks. At 100 TB the per-bucket windows are the only
corpus-sized work and they parallelize across buckets; width tuning is
the same exercise as choosing ``RANGE`` partition boundaries for a
sorted write (``TableCatalog.write_sorted``), and a data-derived
alternative is to bucket on quantiles from ``approxQuantile``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_ordinals(
    df: DataFrame,
    order_by: list[Column],
    bucket: Column,
    ordinal_name: str = "ordinal",
) -> DataFrame:
    """Append ``ordinal_name`` = row_number over the global ``order_by``.

    ``bucket`` must be monotone along ``order_by``'s total order (rows
    comparing earlier never get a larger bucket id, and rows with equal
    leading keys share a bucket). Violations are a contract bug; the
    unit test cross-checks against the one-partition window.
    """
    clash = {"__bucket", "__offset"} & set(df.columns)
    if clash:
        raise ValueError(
            f"global_ordinals: input columns {sorted(clash)} collide with "
            "internal scratch names; rename them before calling"
        )
    bucketed = df.withColumn("__bucket", bucket)
    counts = bucketed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    # n_buckets rows: the one intentionally-serial window in the plan.
    off_w = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__offset"),
    )
    local_w = Window.partitionBy("__bucket").orderBy(*order_by)
    return (
        bucketed.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            ordinal_name,
            (F.col("__offset") + F.row_number().over(local_w)).cast("long"),
        )
        .drop("__bucket", "__offset")
    )
