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


# ---------------------------------------------------------------------------
# Lane-min distinct sketch (stochastic-averaging KMV / PCSA family)
# ---------------------------------------------------------------------------

LANE_M = 16 ** 10  # hash range: first 10 md5 hex digits as an integer
LANES = 64

# Linear-counting estimates n = L*ln(L/V) for V empty lanes, rounded
# ONCE here and shared verbatim with every oracle — no runtime log()
# for an engine build to disagree on. V=0 switches to the lane-sum
# estimator (dense regime), V=L means an empty set.
LINEAR_COUNT_TABLE = [266, 222, 196, 177, 163, 151, 142, 133, 126, 119, 113, 107, 102, 97, 93, 89, 85, 81, 78, 74, 71, 68, 65, 63, 60, 58, 55, 53, 51, 48, 46, 44, 42, 40, 39, 37, 35, 33, 32, 30, 28, 27, 25, 24, 23, 21, 20, 18, 17, 16, 15, 13, 12, 11, 10, 9, 7, 6, 5, 4, 3, 2, 1]


def lane_min_sketch(
    df: DataFrame, key: Column, set_col: Column, n_lanes: int = LANES
) -> DataFrame:
    """Mergeable distinct-count sketch: per (set, lane) the MINIMUM of a
    uniform md5-derived hash of ``key`` — the stochastic-averaging
    variant of K-Minimum-Values (one minimum per lane instead of a
    global k-smallest list), the same register layout HyperLogLog uses.

    Why this shape at 100 TB: a per-lane MIN is a commutative monoid, so
    the shuffle carries at most ``n_lanes`` rows per partition per set
    (map-side combined) REGARDLESS of key cardinality, and per-shard
    sketches merge by lane-wise min — the distinct-count analog of the
    CMS/HLL rollup. A true KMV (global k-smallest) needs a top-k
    merge; lane minima keep everything inside plain ``min`` aggregation.

    Determinism: the hash is integer arithmetic on md5 hex (the repo's
    portable-hash idiom), so the sketch — and every estimate derived
    from it — is bit-identical in any engine; a DuckDB oracle replays
    it exactly. No RNG, no engine hash.

    Returns (set, lane, m) with one row per NON-EMPTY lane.
    """
    h = F.md5(key.cast("string"))
    return (
        df.select(
            set_col.alias("set"),
            (
                F.conv(F.substring(h, 27, 4), 16, 10).cast("long")
                % n_lanes
            ).alias("lane"),
            F.conv(F.substring(h, 1, 10), 16, 10).cast("long").alias("v"),
        )
        .groupBy("set", "lane")
        .agg(F.min("v").alias("m"))
    )


def lane_min_merge(*sketches: DataFrame) -> DataFrame:
    """Lane-wise min per set — the sketch of a union of each set's
    shard inputs (exactly, by the monoid property)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("set", "lane").agg(F.min("m").alias("m"))


def lane_union(sketch: DataFrame, label: str) -> DataFrame:
    """The sketch of the UNION of all sets in ``sketch`` (lane-wise min
    ACROSS sets), labeled ``label`` — inclusion–exclusion's third term."""
    return (
        sketch.groupBy("lane")
        .agg(F.min("m").alias("m"))
        .select(F.lit(label).alias("set"), "lane", "m")
    )


def lane_min_estimate(sketch: DataFrame, n_lanes: int = LANES) -> DataFrame:
    """Distinct-count estimate per set, exact-integer end to end.

    Hybrid estimator (the HLL small-range switch):

    * any EMPTY lane (V >= 1) -> linear counting n = L*ln(L/V), read
      from ``LINEAR_COUNT_TABLE`` — the sparse-regime MLE, precomputed
      so no runtime log() exists;
    * all lanes hit (V = 0, n > ~6L) -> lane-sum n = L*L*M div sum(m)
      (each lane's min of ~n/L uniforms on [0,M) has mean ~ M*L/n; the
      occupancy bias is < 0.3% once every lane is hit).

    Both branches are pure integer arithmetic on the sketch, so the
    ESTIMATE itself is oracle-checkable — unlike HLL, whose estimate is
    library-specific.
    """
    agg = sketch.groupBy("set").agg(
        F.sum("m").alias("sm"), F.count(F.lit(1)).alias("nl")
    )
    lc = F.array(*[F.lit(x) for x in LINEAR_COUNT_TABLE])
    v = F.lit(n_lanes) - F.col("nl")
    return agg.select(
        "set",
        F.when(v >= n_lanes, F.lit(0))
        .when(v >= 1, F.element_at(lc, v.cast("int")))
        .otherwise(
            (
                F.lit(n_lanes).cast("long") * n_lanes * F.lit(LANE_M)
                - (
                    F.lit(n_lanes).cast("long") * n_lanes * F.lit(LANE_M)
                ) % F.col("sm")
            ) / F.col("sm")
        )
        .cast("long")
        .alias("est"),
    )
