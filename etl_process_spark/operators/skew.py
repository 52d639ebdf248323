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


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: shard each hot key across ``n_salts`` lanes.

    AQE splits skewed SORT-MERGE partitions at runtime, but only at
    shuffle-block granularity and only for supported join types; this is
    the explicit, planner-independent form. The LARGE side gets a
    deterministic lane from a row-identity column (crc32, never rand()
    — retries and re-runs land in the same lane); the SMALL side is
    replicated ×``n_salts`` (explode over a literal lane array), so
    every (key, lane) pair finds its match. Results are EXACTLY the
    plain join's — salting changes physical distribution only.

    Replication multiplies the small side's shuffle volume by
    ``n_salts``: use for dimension-vs-skewed-fact joins where the dim is
    too big to broadcast outright but ``n_salts × |dim|`` still shuffles
    comfortably. ``how`` supports inner/left (left_anti and left_semi
    would double-count lanes; use the plain join for those).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    clash = (set(large.columns) & set(small.columns)) - {key}
    if clash:
        raise ValueError(f"column clash outside the join key: {sorted(clash)}")
    lane = (F.crc32(F.col(salt_col).cast("string")) % n_salts).cast("int")
    lanes = F.array(*[F.lit(i) for i in range(n_salts)])
    l = large.withColumn("__lane", lane)
    s = small.withColumn("__lane", F.explode(lanes))
    out = l.join(s, [key, "__lane"], how).drop("__lane")
    return out
