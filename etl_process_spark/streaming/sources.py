"""Streaming sources: file-source streams over the events schema.

The file source is the streaming twin of the reference's dated-inbox
pattern (``py_scripts/transaction.py:26-28``): new files appearing in a
directory are discovered and processed exactly once, with source-tracked
offsets replacing the hand-rolled ``vean_meta_date`` watermark table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def events_schema() -> T.StructType:
    """Schema of the events table (TESTDATA.md), microsecond timestamps.

    Streaming file sources require a declared schema — no inference at
    runtime, so a schema drift in arriving files fails fast instead of
    corrupting state.
    """
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_event_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """File-source stream over an events directory.

    ``maxFilesPerTrigger`` bounds per-microbatch work (the knob that keeps
    a backlogged directory from producing one giant batch); offsets are
    checkpointed by the sink's ``checkpointLocation``.
    """
    reader = spark.readStream.schema(schema or events_schema())
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.format(fmt).load(path)


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: keep the first arrival per key,
    drop re-deliveries that arrive within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` stores one state row per key and —
    unlike plain ``dropDuplicates`` on a stream — EVICTS it once the
    watermark passes the first arrival's event time plus the delay, so
    state is O(keys per horizon), not O(keys ever seen). This is the
    streaming twin of the batch anti-join dedup-on-insert
    (reference transaction.py:80-84) and the ingestion guard of a
    training-data pipeline: at-least-once upstreams (queues, retried
    file loads) become exactly-once tables as long as re-deliveries
    land inside the horizon."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
