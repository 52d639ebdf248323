"""Streaming-shaped queries, batch-checkable (SURVEY §2.9 extension).

Each builder here is the batch run of a window operator whose logical plan
is identical on a stream (see etl_process_spark.streaming) — registering
them gives the windowed semantics a DuckDB oracle, while the
stream-vs-batch equivalence itself is covered in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_process_spark.queries.registry import query, tbl
from etl_process_spark.streaming.stateful import sessionize_batch
from etl_process_spark.streaming.windows import session_agg, sliding_counts

_SESSION_ORACLE = """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,4))) * 10000 AS BIGINT)
             AS total_value_e4
    FROM sess
    GROUP BY user_id, sid
"""


@query("session_windows", _SESSION_ORACLE)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-sessionization via the native session_window aggregate (events
    within 30 min of the previous one merge; window closes gap after the
    last event). Identical plan runs streaming with a state store."""
    return session_agg(tbl(spark, sf_dir, "events"), gap="30 minutes")


@query("sessionize_batch_twin", _SESSION_ORACLE)
def sessionize_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gaps-and-islands sessionizer (lag → flag → running sid → agg) —
    the batch twin of the applyInPandasWithState streaming operator, which
    must agree with session_windows row-for-row."""
    return sessionize_batch(tbl(spark, sf_dir, "events"), gap_seconds=1800)


@query(
    "decreasing_runs",
    """
    WITH lg AS (
      SELECT user_id, event_id, ts, value,
             lag(value, 1) OVER w AS v1,
             lag(value, 2) OVER w AS v2,
             lag(ts, 2) OVER w AS run_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts, run_start
    FROM lg
    WHERE value < v1 AND v1 < v2
      AND date_diff('microsecond', run_start, ts) <= 21600000000
    """,
)
def decreasing_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern (reference rule 4 shape, report.py:109-113):
    strictly decreasing 3-run within 6h per user — lag columns in batch,
    the applyInPandasWithState detector on a stream (same output)."""
    from etl_process_spark.streaming.patterns import decreasing_run_batch

    return decreasing_run_batch(tbl(spark, sf_dir, "events"), k=3, window_seconds=6 * 3600)


@query(
    "sliding_window_counts",
    """
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           count(*) AS n_events
    FROM (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
             AS window_start
      FROM events
    )
    GROUP BY window_start
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) 1h/30min event counts — each event fans out to
    its two covering windows before a single map-combined aggregate."""
    return sliding_counts(tbl(spark, sf_dir, "events"))


@query(
    "trending_types_per_window",
    """
    WITH counts AS (
      SELECT time_bucket(INTERVAL 6 HOURS, ts) AS window_start,
             time_bucket(INTERVAL 6 HOURS, ts) + INTERVAL 6 HOURS AS window_end,
             event_type,
             count(*) AS n_events
      FROM events GROUP BY 1, 2, 3)
    SELECT window_start, window_end, event_type, n_events,
           CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY window_start
                        ORDER BY n_events DESC, event_type) AS rnk
          FROM counts)
    WHERE rnk <= 2
    """,
)
def trending_types_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending top-2 event types per 6-hour tumbling window — the batch
    twin of `streaming/windows.py::trending_stream` (rank OVER a
    streaming aggregate is inexpressible in one streaming query; the
    streaming path ranks finalized windows in foreachBatch with THIS
    exact topk_per_window, proven stream==batch in
    tests/test_streaming.py::test_trending_stream_matches_batch_topk).

    The rank window partitions by window_start — the same key the
    counts aggregate shuffled on, so the ranking adds no corpus-sized
    exchange. (count desc, type asc) pins ties in both engines.
    """
    from etl_process_spark.streaming.windows import (
        topk_per_window,
        tumbling_counts,
    )

    ev = tbl(spark, sf_dir, "events")
    return topk_per_window(
        tumbling_counts(ev, window_duration="6 hours", watermark=None), k=2
    )


@query(
    "late_window_rebuild",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,4))) * 10000 AS BIGINT)
             AS total_value_e4
    FROM events
    GROUP BY 1, 2
    """,
)
def late_window_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data backfill for a stored windowed rollup — IVM for
    tumbling windows: events with event_id % 13 = 0 play the late
    arrivals (below the watermark when `hourly_rollup` was last
    committed), and the repair recomputes ONLY the hours the late batch
    touches, splicing them over the stored rows:

        new = stored ▷ touched_hours  ∪  recompute(all events ⋉ touched)

    The oracle recomputes the whole rollup — hash equality is the
    windowed-IVM theorem: a late batch costs O(late ∪ touched-window
    events), never a full-history rescan. This is exactly what
    `streaming/windows.py`'s watermarked aggregates do inside Spark's
    state store; here it is the BATCH repair path for data arriving
    after watermark expiry (the case streaming must drop). Touched
    hours broadcast (≤ window count); both aggregates share the
    (hour, type) exchange shape; DECIMAL sums splice exactly.
    """
    ev = tbl(spark, sf_dir, "events")
    late = ev.where(F.col("event_id") % 13 == 0)
    early = ev.where(F.col("event_id") % 13 != 0)

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.col("value").cast("decimal(12,4)")) * 10000)
            .cast("bigint")
            .alias("total_value_e4"),
        )

    stored = rollup(early)
    touched = late.select(
        F.date_trunc("hour", "ts").alias("window_start")
    ).distinct()
    untouched = stored.join(F.broadcast(touched), "window_start", "left_anti")
    rebuilt = rollup(
        ev.join(
            F.broadcast(touched),
            F.date_trunc("hour", "ts") == F.col("window_start"),
        ).drop("window_start")
    )
    return untouched.unionByName(rebuilt)


@query(
    "session_type_profile",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_type,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    per_type AS (
      SELECT user_id, sid, event_type, count(*) AS cnt,
             min(ts) AS t0, max(ts) AS t1
      FROM sess GROUP BY user_id, sid, event_type
    ),
    ranked AS (
      SELECT user_id, sid, event_type, cnt,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY cnt DESC, event_type ASC) AS rn
      FROM per_type
    ),
    agg AS (
      SELECT user_id, sid, min(t0) AS session_start,
             max(t1) + INTERVAL 30 MINUTE AS session_end,
             CAST(sum(cnt) AS BIGINT) AS n_events,
             count(*) AS n_types
      FROM per_type GROUP BY user_id, sid
    )
    SELECT a.user_id, a.session_start, a.session_end, a.n_events,
           a.n_types, r.event_type AS top_type,
           CAST(r.cnt AS BIGINT) AS top_type_n
    FROM agg a
    JOIN ranked r ON r.user_id = a.user_id AND r.sid = a.sid AND r.rn = 1
    """,
)
def session_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level type profile (distinct-type count + modal event
    type, smallest type on count ties) — the batch twin of the MapState
    ``transformWithStateInPandas`` operator
    (streaming/stateful.py::session_type_profile_stream_tws; the
    stream-vs-batch differential lives in tests/test_streaming.py).
    Registering the twin gives the SEMANTICS a DuckDB oracle."""
    from etl_process_spark.streaming.stateful import session_type_profile_batch

    return session_type_profile_batch(tbl(spark, sf_dir, "events"), gap_seconds=1800)


@query(
    "session_trace_summary",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    traced AS (
      SELECT user_id, sid, ts, event_id,
             first_value(event_id) OVER (PARTITION BY user_id, sid
                                         ORDER BY ts, event_id) AS fid,
             last_value(event_id) OVER (PARTITION BY user_id, sid
                                        ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS lid
      FROM sess
    )
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           min(fid) AS first_event_id, min(lid) AS last_event_id,
           CAST(sum(event_id) AS BIGINT) AS id_checksum
    FROM traced GROUP BY user_id, sid
    """,
)
def session_trace_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session event-trace summary (first/last event id in (ts, id)
    order + order-independent integer id checksum) — the batch twin of
    the ListState ``transformWithStateInPandas`` operator
    (streaming/stateful.py::session_trace_stream_tws)."""
    from etl_process_spark.streaming.stateful import session_trace_batch

    return session_trace_batch(tbl(spark, sf_dir, "events"), gap_seconds=1800)
