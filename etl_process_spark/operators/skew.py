"""Skew-mitigation operators.

AQE's skew-join splitting (on in this engine's session) handles skewed
JOINS at runtime; a skewed AGGREGATION key still funnels one reducer.
``salted_agg`` is the standing fix: split each hot key across n salt
lanes (two-phase aggregate), so no single reducer owns a whole hot key.

The salt is a DETERMINISTIC hash of a row-identity column — never
``rand()`` — so re-runs, retries, and the DuckDB oracle all see the same
lane assignment (and results are identical anyway because the aggregates
re-combine exactly).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_agg, final_agg) pairs per supported algebraic aggregate:
# stage 1 computes per-(key, salt), stage 2 re-combines per key.
_ALGEBRAIC: dict[str, tuple[Callable[[str], Column], Callable[[str], Column]]] = {
    "count": (lambda c: F.count(F.lit(1)), lambda c: F.sum(c)),
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
}


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    salt_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    aggs: (fn, input_col, output_name) with fn in {count, sum, min, max}
    (algebraic aggregates — they re-combine exactly, so salting changes
    the physical distribution and nothing else).
    salt_col: any column giving row identity (an id); salted lane =
    crc32(salt_col) % n_salts.
    """
    for fn, _, _ in aggs:
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{fn}: not algebraic; salting would change results")
    salt = (F.crc32(F.col(salt_col).cast("string")) % n_salts).alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(
            *[
                _ALGEBRAIC[fn][0](in_col).alias(f"__p_{out}")
                for fn, in_col, out in aggs
            ]
        )
    )
    return partial.groupBy(*key_cols).agg(
        *[
            _ALGEBRAIC[fn][1](f"__p_{out}").alias(out)
            for fn, in_col, out in aggs
        ]
    )
