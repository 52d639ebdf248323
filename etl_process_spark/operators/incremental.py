"""Incremental aggregate maintenance — merge per-batch partials into a
running summary instead of recomputing history.

The reference's whole design is incremental LOADING (high-watermark
pulls, cards.py:35-56) but its report still recomputes from full tables
each night. For aggregates over algebraic functions (count/sum/min/max)
the summary itself can be maintained incrementally: aggregate each new
batch alone, then combine with the stored summary — cost is O(batch +
summary), never O(history). At a 100 TB/day ingest that is the
difference between a minutes-long refresh and a full recompute; it is
the materialized-view maintenance pattern, expressed as two ordinary
groupBys and kept exact because algebraic aggregates re-combine without
loss (same argument as operators/skew.py::salted_agg).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# stage-1 (per batch) and combine (summary ⊕ summary) pairs
_ALGEBRAIC: dict[str, tuple[Callable[[str], Column], Callable[[str], Column]]] = {
    "count": (lambda c: F.count(F.lit(1)), lambda c: F.sum(c)),
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
}


def partial_agg(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[tuple[str, str, str]]
) -> DataFrame:
    """Aggregate one batch into summary form.

    aggs: (fn, input_col, output_name), fn ∈ {count, sum, min, max} —
    the algebraic set; avg/variance callers store (sum, count) /
    (sum, sum-of-squares, count) parts and finish at read time
    (see the `price_moments_exact` query for the exact-decimal form).
    """
    for fn, _, _ in aggs:
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{fn}: not algebraic; cannot maintain incrementally")
    return df.groupBy(*keys).agg(
        *[_ALGEBRAIC[fn][0](c).alias(out) for fn, c, out in aggs]
    )


def merge_partials(
    summary: DataFrame,
    batch_partial: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
) -> DataFrame:
    """Combine a stored summary with a new batch's partial: union then
    re-combine per key. Both inputs are summary-sized, so the shuffle
    carries group cardinality, not row counts."""
    return summary.unionByName(batch_partial).groupBy(*keys).agg(
        *[_ALGEBRAIC[fn][1](out).alias(out) for fn, _, out in aggs]
    )
