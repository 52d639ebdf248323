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
            (F.sum(F.col(value_col).cast("decimal(12,4)")) * 10000)
            .cast("bigint").alias("total_value_e4"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            group_col,
            "n_events",
            "total_value_e4",
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
            (F.sum(F.col(value_col).cast("decimal(12,4)")) * 10000)
            .cast("bigint").alias("total_value_e4"),
        )
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value_e4",
        )
    )


def topk_per_window(counts: DataFrame, k: int = 2) -> DataFrame:
    """Rank groups inside each tumbling window and keep the top ``k`` —
    the 'trending items' step over the ``tumbling_counts`` output.
    Deterministic (count desc, group asc) tie order; the rank window
    re-uses the window_start grouping so at scale it partitions by the
    same key the counts already shuffled on."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "window_start", "window_end", "event_type", "n_events",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def trending_stream(
    stream_df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    k: int = 2,
    window_duration: str = "6 hours",
    watermark: str = "0 seconds",
):
    """Streaming 'trending per window' top-k — the dashboard query that
    pure streaming aggregation can't express (ranking is a window
    function OVER an aggregate, and Spark forbids stacking them in one
    streaming query).

    The composition that does work: append-mode ``tumbling_counts``
    emits each window's rows exactly ONCE, atomically, when the
    watermark passes its end — so every micro-batch ``foreachBatch``
    receives only whole, finalized windows, and ranking inside the
    batch with the SAME ``topk_per_window`` the batch path uses is
    exact (no partial-window re-ranking, no update-mode retractions).
    State stays bounded by the watermark horizon; the sink is parquet,
    one ``epoch=<batch_id>`` directory per micro-batch written with
    OVERWRITE — so a replayed epoch (crash between sink write and
    checkpoint commit) rewrites its own directory instead of appending
    duplicates. A plain ``mode("append")`` here is the classic
    at-least-once foreachBatch trap; the epoch-keyed overwrite is the
    standard idempotent-sink pattern. Read the sink back with
    ``read_trending`` (drops the epoch partition column).

    Returns the started StreamingQuery; callers await and read
    ``sink_dir``.
    """
    counts = tumbling_counts(
        stream_df, window_duration=window_duration, watermark=watermark
    )

    def rank_and_append(batch_df: DataFrame, batch_id: int) -> None:
        out = topk_per_window(batch_df, k=k)
        out.write.mode("overwrite").parquet(f"{sink_dir}/epoch={batch_id}")

    return (
        counts.writeStream.foreachBatch(rank_and_append)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_trending(spark, sink_dir: str) -> DataFrame:
    """Read the trending sink back without the epoch partition column
    (an implementation detail of the idempotent per-epoch overwrite)."""
    return spark.read.parquet(sink_dir).drop("epoch")


def windowed_lane_sketch(
    df: DataFrame,
    window_duration: str = "6 hours",
    ts_col: str = "ts",
    set_col: str = "event_type",
    key_col: str = "user_id",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Per-window lane-min distinct sketch (`operators/sketch.py`) on a
    stream: groupBy(window, set, lane) → min(hash). State is bounded by
    windows-in-flight × sets × 64 lane registers — a distinct-COUNT
    surface whose streaming state never grows with key cardinality
    (count_distinct on a stream would hold every key).

    Closed windows emit their lane minima; downstream,
    `lane_min_estimate` turns any selection of emitted rows into
    distinct counts, and lane-wise min across windows/sets rolls up to
    coarser grains or audience unions WITHOUT re-reading events — the
    streaming end of the `user_overlap_sketch` path.
    """
    from etl_process_spark.operators.sketch import LANES

    src = _maybe_watermark(df, ts_col, watermark)
    h = F.md5(F.col(key_col).cast("string"))
    return (
        src.select(
            F.col(ts_col),
            F.col(set_col).alias("set"),
            (F.conv(F.substring(h, 27, 4), 16, 10).cast("long") % LANES)
            .alias("lane"),
            F.conv(F.substring(h, 1, 10), 16, 10).cast("long").alias("v"),
        )
        .groupBy(
            F.window(ts_col, window_duration).alias("win"), "set", "lane"
        )
        .agg(F.min("v").alias("m"))
        .select(
            F.col("win.start").alias("window_start"), "set", "lane", "m"
        )
    )
