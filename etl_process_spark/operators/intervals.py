"""Interval-overlap (two-sided range) join.

The reference has no both-sides-range join (SURVEY §2.3 "not present");
this is the standing extension for temporal workloads: match every pair of
rows whose time intervals overlap, optionally within equi-key groups.

Spark has no native range-join operator — a bare range predicate plans as
BroadcastNestedLoopJoin (small side) or a cartesian product: O(n·m)
comparisons, dead at scale. The fix is the classic binning rewrite:

  1. pick a bin width; each interval covers ceil(len/width)+1 bins;
  2. explode both sides into (key…, bin) rows via ``sequence()``;
  3. equi-join on (key…, bin) — a plain shuffled hash join Catalyst can
     plan, partition, and AQE-skew-split like any other;
  4. keep a matched pair only where ``bin == greatest(bin(l_start),
     bin(r_start))`` — the FIRST bin the two intervals share — so each
     overlapping pair survives exactly once with NO distinct/dedup shuffle;
  5. apply the exact overlap predicate as a post-join filter.

Cost: |rows| × (interval_len / bin_width) exploded rows and one shuffle.
Pick ``bin_width`` near the typical interval length: too small explodes
rows, too large degrades bins toward a cartesian within each bin.

Overlap semantics are half-open ([start, end)): ``l.start < r.end AND
r.start < l.end`` — touching endpoints do NOT overlap, matching the strict
boundary convention of the as-of join (operators/asof.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: Sequence[str] = (),
    bin_width_seconds: int = 3600,
) -> DataFrame:
    """Inner-join rows whose [start, end) intervals overlap.

    ``on``: optional equi-key columns (same names both sides) that scope
    the match — e.g. per user. With keys, the join key is (keys…, bin);
    without, every row shares the bin keyspace (fine when intervals are
    spread over time, pathological if everything overlaps everything).

    Output: all left columns, then all right columns (names must be
    disjoint — alias before calling).
    """
    clash = set(left.columns) & set(right.columns) - set(on)
    if clash:
        raise ValueError(f"left/right column clash: {sorted(clash)}")
    w = int(bin_width_seconds)
    if w <= 0:
        raise ValueError("bin_width_seconds must be positive")

    def binned(df: DataFrame, start: str, end: str, side: str) -> DataFrame:
        # unix_timestamp truncates to seconds; covering end's own bin (no
        # exclusive -1) keeps the cover a superset under sub-second
        # boundaries — the exact overlap filter discards any false pairs,
        # and pair-uniqueness only needs max(start-bins) covered by both.
        s_bin = F.floor(F.unix_timestamp(F.col(start)) / w)
        e_bin = F.floor(F.unix_timestamp(F.col(end)) / w)
        return df.withColumn(
            "__bin",
            F.explode(F.sequence(s_bin, F.greatest(e_bin, s_bin))),
        ).withColumn(f"__{side}_sbin", s_bin)

    l = binned(left, left_start, left_end, "l")
    r = binned(right, right_start, right_end, "r")
    keys = [*on, "__bin"]
    joined = l.join(r, keys, "inner")
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )
    first_shared = F.col("__bin") == F.greatest(
        F.col("__l_sbin"), F.col("__r_sbin")
    )
    out_cols = [*on] + [
        c for c in left.columns if c not in on
    ] + [c for c in right.columns if c not in on]
    return joined.filter(overlap & first_shared).select(*out_cols)
