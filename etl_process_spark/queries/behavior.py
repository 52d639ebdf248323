"""User-behavior analytics over the events table: ordered funnels, weekly
cohort retention, robust (median/MAD) outlier detection.

These are the product-analytics shapes a clickstream warehouse runs daily;
none exist in the reference (its report.py is rule-based fraud), so they
extend SURVEY §2's window/aggregate families with the sequential-semantics
variants (step N's timestamp depends on step N-1's).

Scale notes
-----------
* ``funnel_conversion`` computes all four step timestamps with consecutive
  window functions over ONE ``partitionBy(user_id)`` exchange — Catalyst
  reuses the partitioning across the four Window nodes, so the corpus is
  shuffled once regardless of funnel depth, then reduced per user.
* ``cohort_retention_weekly`` is two user-keyed aggregations joined on
  user_id (same key → co-partitioned) and a ≤(cohorts×weeks)-row output.
* ``value_mad_outliers`` broadcasts the per-type medians back (5 rows);
  the corpus is scanned twice but shuffled only for two tiny aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_process_spark.queries.registry import query, tbl

_FUNNEL = ("signup", "view", "click", "purchase")


@query(
    "funnel_conversion",
    """
    WITH u1 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'signup' GROUP BY 1),
         u2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                JOIN u1 ON e.user_id = u1.user_id
                WHERE e.event_type = 'view' AND e.ts > u1.t GROUP BY 1),
         u3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                JOIN u2 ON e.user_id = u2.user_id
                WHERE e.event_type = 'click' AND e.ts > u2.t GROUP BY 1),
         u4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                JOIN u3 ON e.user_id = u3.user_id
                WHERE e.event_type = 'purchase' AND e.ts > u3.t GROUP BY 1),
         steps AS (
           SELECT 1 AS step_no, 'signup' AS step, count(*) AS users FROM u1
           UNION ALL
           SELECT 2, 'view', count(*) FROM u2
           UNION ALL
           SELECT 3, 'click', count(*) FROM u3
           UNION ALL
           SELECT 4, 'purchase', count(*) FROM u4)
    SELECT step_no, step, users,
           CAST((1000000 * users) // max(users) OVER () AS BIGINT) AS conv_ppm
    FROM steps
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup→view→click→purchase.

    Step N is reached at the FIRST event of its type strictly after the
    user reached step N-1 (strict ordering, not mere presence — a purchase
    before any click does not count). All four step timestamps come from
    consecutive whole-partition window mins over the same
    ``partitionBy(user_id)``: one exchange total, depth-independent.
    """
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    df = ev.select("user_id", "event_type", "ts")
    prev = None
    for i, step in enumerate(_FUNNEL, start=1):
        cond = F.col("event_type") == step
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() & (F.col("ts") > F.col(prev))
        df = df.withColumn(f"t{i}", F.min(F.when(cond, F.col("ts"))).over(w))
        prev = f"t{i}"
    per_user = df.groupBy("user_id").agg(
        *[F.max(f"t{i}").alias(f"t{i}") for i in range(1, 5)]
    )
    # ONE global aggregate carrying all four step counts, then a map-side
    # stack() unpivot — a unionAll of per-step aggregates would re-execute
    # the scan + window chain once per step
    counts = per_user.agg(
        *[F.count(f"t{i}").alias(f"c{i}") for i in range(1, 5)]
    )
    stack_args = ", ".join(
        f"{i}, '{s}', c{i}" for i, s in enumerate(_FUNNEL, start=1)
    )
    return counts.select(
        F.expr(f"stack(4, {stack_args}) AS (step_no, step, users)"), "c1"
    ).select(
        "step_no", "step", "users",
        F.expr("(1000000 * users) div c1").alias("conv_ppm"),
    )


@query(
    "cohort_retention_weekly",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY 1),
    active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
      FROM events),
    cohort_sizes AS (
      SELECT cohort_week, count(*) AS cohort_size FROM first_seen GROUP BY 1)
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.w) / 7 AS INT) AS week_offset,
           count(*) AS active_users,
           CAST((1000000 * count(*)) // any_value(s.cohort_size) AS BIGINT)
             AS retention_ppm
    FROM first_seen f
    JOIN active a ON f.user_id = a.user_id
    JOIN cohort_sizes s ON f.cohort_week = s.cohort_week
    GROUP BY 1, 2
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle.

    Cohort = ISO week of a user's first event; a cohort's week-``k`` cell
    counts its users with ANY event in cohort_week+k. Both inputs are
    user-keyed aggregates joined on user_id (co-partitioned, no extra
    shuffle); cohort sizes re-derive from the same first_seen aggregate
    via a tiny broadcast.
    """
    ev = tbl(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("w")
    ).distinct()
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        first_seen.join(active, "user_id")
        .join(F.broadcast(sizes), "cohort_week")
        .groupBy("cohort_week", (F.datediff("w", "cohort_week") / 7)
                 .cast("int").alias("week_offset"))
        .agg(
            F.count("*").alias("active_users"),
            F.expr("(1000000 * count(*)) div any_value(cohort_size)")
            .alias("retention_ppm"),
        )
    )


@query(
    "value_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, median(value) AS med
      FROM events GROUP BY 1),
    mad AS (
      SELECT e.event_type, any_value(m.med) AS med,
             median(abs(e.value - m.med)) AS mad
      FROM events e JOIN med m ON e.event_type = m.event_type
      GROUP BY 1)
    SELECT event_type, med_e6, mad_e6, n_outliers,
           CAST((1000000 * n_outliers - (1000000 * n_outliers) % n) / n
                AS BIGINT) AS outlier_ppm
    FROM (
      SELECT e.event_type,
             CAST(floor(any_value(m.med) * 1000000) AS BIGINT) AS med_e6,
             CAST(floor(any_value(m.mad) * 1000000) AS BIGINT) AS mad_e6,
             count(*) FILTER (WHERE abs(e.value - m.med) > 3 * m.mad)
               AS n_outliers,
             count(*) AS n
      FROM events e JOIN mad m ON e.event_type = m.event_type
      GROUP BY 1)
    """,
)
def value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier detection: median + MAD, 3-MAD fence.

    Median/MAD resist the heavy tails that make mean/stddev fences
    useless on revenue-like columns. Exact ``percentile`` (sort-based
    within each of ~5 type groups) is fine here because the group count
    is tiny; the 5-row median table broadcasts back onto the corpus so
    the big side never reshuffles for the join.
    """
    ev = tbl(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("med"),
            F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
        )
    )
    is_out = F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad")
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.floor(F.any_value("med") * 1000000.0).cast("long").alias("med_e6"),
            F.floor(F.any_value("mad") * 1000000.0).cast("long").alias("mad_e6"),
            F.count(F.when(is_out, 1)).alias("n_outliers"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(
            "event_type", "med_e6", "mad_e6", "n_outliers",
            F.expr("(1000000 * n_outliers) div __n").alias("outlier_ppm"),
        )
    )


@query(
    "last_touch_attribution",
    """
    SELECT t.event_type AS channel, count(*) AS purchases
    FROM events p, LATERAL (
      SELECT e.event_type
      FROM events e
      WHERE e.user_id = p.user_id
        AND (e.ts, e.event_id) < (p.ts, p.event_id)
        AND e.event_type <> 'purchase'
        AND e.ts >= p.ts - INTERVAL 7 DAY
      ORDER BY e.ts DESC, e.event_id DESC
      LIMIT 1) t
    WHERE p.event_type = 'purchase'
    GROUP BY 1
    """,
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent preceding non-purchase event within 7 days.

    The oracle states it as a correlated LATERAL top-1 — the formulation
    warehouses actually run, quadratic per user. The Spark build is the
    as-of-VIA-WINDOW pattern: one sort within a single user_id exchange,
    carrying the last non-purchase (ts, type) with
    ``last(..., ignoreNulls=True)`` over ROWS UNBOUNDED..1 PRECEDING —
    no join at all, linear per user whatever the history length. Total
    (ts, event_id) ordering on both sides makes same-timestamp
    tie-breaks engine-independent.
    """
    ev = tbl(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.col("event_type") != "purchase"
    attributed = (
        ev.withColumn(
            "prev_type",
            F.last(F.when(non_purchase, F.col("event_type")), ignorenulls=True)
            .over(w),
        )
        .withColumn(
            "prev_ts",
            F.last(F.when(non_purchase, F.col("ts")), ignorenulls=True).over(w),
        )
        .where(
            (F.col("event_type") == "purchase")
            & F.col("prev_ts").isNotNull()
            & (F.col("prev_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS"))
        )
    )
    return attributed.groupBy(F.col("prev_type").alias("channel")).agg(
        F.count("*").alias("purchases")
    )


@query(
    "funnel_time_to_convert",
    """
    WITH u1 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'signup' GROUP BY 1),
         u2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                JOIN u1 ON e.user_id = u1.user_id
                WHERE e.event_type = 'view' AND e.ts > u1.t GROUP BY 1),
         u3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                JOIN u2 ON e.user_id = u2.user_id
                WHERE e.event_type = 'click' AND e.ts > u2.t GROUP BY 1),
         u4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                JOIN u3 ON e.user_id = u3.user_id
                WHERE e.event_type = 'purchase' AND e.ts > u3.t GROUP BY 1),
         d AS (SELECT u1.user_id,
                      date_diff('second', u1.t, u4.t) AS sec
               FROM u4 JOIN u1 ON u4.user_id = u1.user_id)
    SELECT count(*) AS n_completers,
           CAST(floor(quantile_cont(sec, 0.5) * 1000000) AS BIGINT)
             AS median_sec_e6,
           CAST(floor(quantile_cont(sec, 0.9) * 1000000) AS BIGINT)
             AS p90_sec_e6
    FROM d
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert for funnel completers: exact median and p90 of
    signup→purchase latency (integer seconds, interpolated percentile).

    Same one-exchange window-min construction as ``funnel_conversion``;
    the percentile runs over the ≤ |completers| latency column — a
    per-group sort of a user-sized input, nothing corpus-sized.
    """
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    df = ev.select("user_id", "event_type", "ts")
    prev = None
    for i, step in enumerate(_FUNNEL, start=1):
        cond = F.col("event_type") == step
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() & (F.col("ts") > F.col(prev))
        df = df.withColumn(f"t{i}", F.min(F.when(cond, F.col("ts"))).over(w))
        prev = f"t{i}"
    per_user = (
        df.groupBy("user_id")
        .agg(F.max("t1").alias("t1"), F.max("t4").alias("t4"))
        .where(F.col("t4").isNotNull())
        .select(
            (F.unix_timestamp("t4") - F.unix_timestamp("t1")).alias("sec")
        )
    )
    return per_user.agg(
        F.count("*").alias("n_completers"),
        F.floor(F.expr("percentile(sec, 0.5)") * 1000000.0)
        .cast("long").alias("median_sec_e6"),
        F.floor(F.expr("percentile(sec, 0.9)") * 1000000.0)
        .cast("long").alias("p90_sec_e6"),
    )


@query(
    "daily_quality_drift",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n_events,
             count(DISTINCT user_id) AS n_users,
             CAST(CAST(sum(CAST(value AS DECIMAL(12,4))) * 10000 AS BIGINT)
                  * 100 // count(*) AS BIGINT) AS avg_micro
      FROM events GROUP BY 1)
    SELECT day, n_events, n_users, avg_micro,
           CAST((1000000 * (n_events - lag(n_events) OVER (ORDER BY day)))
                // nullif(lag(n_events) OVER (ORDER BY day), 0) AS BIGINT)
             AS volume_drift_ppm,
           CAST((1000000 * (avg_micro - lag(avg_micro) OVER (ORDER BY day)))
                // nullif(lag(avg_micro) OVER (ORDER BY day), 0) AS BIGINT)
             AS value_drift_ppm
    FROM daily
    """,
)
def daily_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-observability drift report: per-day volume, distinct users,
    mean value, and day-over-day relative drift of volume and value —
    the table a pipeline alert rule watches for silent upstream breaks
    (volume cliff, value distribution shift).

    One corpus aggregate (count-distinct adds its expand-shuffle), then
    lag windows over the ALREADY-AGGREGATED day table — like the
    sweep-line query, the non-distributed window touches only
    day-granularity rows, never the corpus.
    """
    ev = tbl(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        # DECIMAL sum, not avg(double): float partial sums are
        # partition-order-dependent. The mean crosses the boundary as
        # exact integer micro-units (scale-4 sum shifted to BIGINT, then
        # integer division) — no engine round() at the edge.
        F.expr(
            "CAST(sum(CAST(value AS DECIMAL(12,4))) * 10000 AS BIGINT)"
            " * 100 div count(*)"
        ).alias("avg_micro"),
    )
    return daily.select(
        "day", "n_events", "n_users", "avg_micro",
        F.expr(
            "(1000000 * (n_events - lag(n_events) OVER (ORDER BY day)))"
            " div nullif(lag(n_events) OVER (ORDER BY day), 0)"
        ).alias("volume_drift_ppm"),
        F.expr(
            "(1000000 * (avg_micro - lag(avg_micro) OVER (ORDER BY day)))"
            " div nullif(lag(avg_micro) OVER (ORDER BY day), 0)"
        ).alias("value_drift_ppm"),
    )


@query(
    "event_transition_probs",
    """
    WITH nxt AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events),
    pairs AS (SELECT from_type, to_type, count(*) AS n
              FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT from_type, to_type, n,
                   sum(n) OVER (PARTITION BY from_type) AS t
            FROM pairs)
    SELECT from_type, to_type, n,
           CAST((1000000 * n - (1000000 * n) % t) / t AS BIGINT) AS p_ppm
    FROM tot
    """,
)
def event_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current event type), the session-flow model behind
    next-action prediction and anomaly scoring (a transition with tiny p
    observed at volume = bot or integration break).

    One ``partitionBy(user_id)`` exchange computes every lead pair (the
    same single-shuffle contract as ``funnel_conversion``); the pair
    counts are map-side-combined into a ≤|types|² table, and the row
    normalization windows over THAT tiny table — the corpus is never
    re-shuffled to normalize. Ties at equal ts are pinned by event_id so
    both engines see the same successor.
    """
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    pairs = (
        nxt.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.expr(
            "(1000000 * n) div sum(n) OVER (PARTITION BY from_type)"
        ).alias("p_ppm"),
    )


@query(
    "gdpr_forget_rollup",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
             AS sum_value_micro
    FROM events
    WHERE user_id % 97 <> 0
    GROUP BY 1
    """,
)
def gdpr_forget_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation into a derived rollup WITHOUT
    recomputing it: subtract the forgotten users' partial aggregates
    from the stored daily rollup (counts and DECIMAL sums are additive,
    hence retractable), dropping days whose count hits zero.

    The oracle recomputes the rollup from retained rows directly — hash
    equality IS the retraction theorem: serving tables derived from a
    100 TB fact can honor deletion requests at O(deleted-rows) cost
    (one filtered scan + a rollup-sized join) instead of an O(corpus)
    rebuild. Sums use DECIMAL partials (exact, order-independent), so
    subtraction leaves no float residue for engines to disagree on;
    both aggregates share one day-keyed exchange per side.
    """
    ev = tbl(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    full = ev.groupBy("day").agg(
        F.count(F.lit(1)).alias("n0"), F.sum("v").alias("s0")
    )
    deleted = (
        ev.where(F.col("user_id") % 97 == 0)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("nd"), F.sum("v").alias("sd"))
    )
    corrected = (
        full.join(deleted, "day", "left")
        .select(
            "day",
            (F.col("n0") - F.coalesce("nd", F.lit(0))).alias("n_events"),
            (
                F.col("s0")
                - F.coalesce(F.col("sd"), F.lit(0).cast("decimal(18,6)"))
            ).alias("sv"),
        )
        .where(F.col("n_events") > 0)
    )
    return corrected.select(
        "day",
        "n_events",
        F.expr("CAST(sv * 1000000 AS BIGINT)").alias("sum_value_micro"),
    )


@query(
    "debounced_events",
    """
    WITH d AS (
      SELECT event_id, user_id, event_type, ts,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events)
    SELECT event_id, user_id, event_type, ts
    FROM d
    WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 300 SECOND
    """,
)
def debounced_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce: drop an event arriving within 300 s of the previous
    SAME (user, type) event — the double-click / retry-storm suppressor
    every clickstream ingest runs before counting anything (the batch
    twin of `streaming/sources.py::dedup_stream`'s watermarked state).

    One (user, type)-keyed exchange for the lag; the keep-predicate is
    a per-row comparison — no self-join against a time band, which is
    the naive O(events × window) formulation. Ties at equal ts are
    ordered by event_id so both engines see the same predecessor.

    The gap compares at FULL microsecond precision (unix_micros diff >
    300_000_000), matching the oracle's exact interval comparison —
    casting to whole seconds would silently keep/drop events whose true
    gap falls in (300 s, 301 s) on data less quantized than the fixture.
    """
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    d = ev.select(
        "event_id", "user_id", "event_type", "ts",
        F.lag("ts").over(w).alias("prev_ts"),
    )
    return d.where(
        F.col("prev_ts").isNull()
        | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 300_000_000)
    ).select("event_id", "user_id", "event_type", "ts")
