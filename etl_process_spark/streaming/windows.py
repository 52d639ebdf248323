"""Watermarked window aggregations (tumbling / sliding / session).

Each builder returns the same logical plan for a batch or a streaming
input frame; on a stream, the optional event-time watermark bounds state
(windows older than the watermark are finalized and evicted). At scale the
shuffle key is (window, group) — state per executor is O(open windows per
key range), never O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_counts(
    df: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Tumbling-window counts + value sum per group.

    Batch twin of the reference's daily rollup cadence; on a stream the
    watermark finalizes each window one delay after its end.
    """
    src = _maybe_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window_duration).alias("win"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            group_col,
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Sliding-window event counts (each event lands in window/slide
    overlapping windows — the hop fan-out happens before the shuffle, so
    the aggregate is still a single map-side-combined groupBy)."""
    src = _maybe_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window_duration, slide_duration).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
        )
    )


def session_agg(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Session windows: events of one key closer than ``gap`` merge into
    one session; the window closes ``gap`` after the last event.

    Built on the native ``session_window`` aggregation (state-store backed
    on streams, plain agg on batch) — no custom state code needed for the
    standard gap-sessionization semantics.
    """
    src = _maybe_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
