"""Count-Min Sketch — the mergeable frequency sketch (Cormode &
Muthukrishnan, J. Algorithms 2005), completing the sketch family next to
HLL distinct counting (``weekly_distinct_rollup_hll``) and Misra-Gries
heavy hitters (``operators/heavy.py``).

Why a sketch when ``groupBy(key).count()`` is exact: the exact plan's
shuffle carries one record per DISTINCT key. A CMS collapses any key
cardinality into a fixed d×w grid of counters that (a) aggregates
map-side — the shuffle is at most d·w rows per partition regardless of
key count, (b) MERGES by cell-wise addition (sketches are linear, so
per-day / per-shard sketches roll up like the HLL rollup), and (c)
answers point queries with one-sided error: ``estimate ≥ true`` always,
``estimate ≤ true + N/w`` in expectation per independent row.

Determinism: hashes are md5 word slices of the key's string form —
engine-portable integer arithmetic (the same idiom as
``bloom_dedup_probe``), so a DuckDB oracle replays the ENTIRE sketch
bit-for-bit; no RNG, no engine-specific hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, row: int, w: int) -> Column:
    """Row ``row``'s bucket: the ``row``-th 8-hex-char word of md5(key),
    as an integer mod w. md5 gives 4 independent words — d ≤ 4."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1 + 8 * row, 8), 16, 10)
        .cast("long") % w
    )


def cms_build(
    df: DataFrame, key: Column, w: int = 256, d: int = 2
) -> DataFrame:
    """Sketch the multiset of ``key`` values: a (row, bucket, cnt) table
    with d·w cells at most. One narrow map stage (each input row emits
    its d cells) and one partially-aggregated shuffle of ≤ d·w rows per
    partition — key cardinality never reaches the wire."""
    if not 1 <= d <= 4:
        raise ValueError("d must be in 1..4 (md5 yields four 32-bit words)")
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _bucket(key, r, w).alias("bucket")
                    )
                    for r in range(d)
                ]
            )
        ).alias("c")
    ).select("c.row", "c.bucket")
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — CMS is linear, so sketches of disjoint batches
    add into exactly the sketch of the union (unit-tested equality)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key: Column, w: int, d: int
) -> DataFrame:
    """Point-estimate each distinct key in ``keys``: min over the d rows
    of that key's cell counts (missing cell ⇒ 0). The sketch is ≤ d·w
    rows — broadcast to the probe side; the probe never shuffles."""
    probes = keys.select(
        "*",
        *[_bucket(key, r, w).alias(f"__b{r}") for r in range(d)],
    )
    est = None
    for r in range(d):
        cell = sketch.where(F.col("row") == r).select(
            F.col("bucket").alias(f"__b{r}"), F.col("cnt").alias(f"__c{r}")
        )
        probes = probes.join(F.broadcast(cell), f"__b{r}", "left")
        c = F.coalesce(F.col(f"__c{r}"), F.lit(0))
        est = c if est is None else F.least(est, c)
    return probes.withColumn("cms_n", est.cast("long")).drop(
        *[f"__b{r}" for r in range(d)], *[f"__c{r}" for r in range(d)]
    )
