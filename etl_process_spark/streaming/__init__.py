"""Structured Streaming surface of the engine.

The reference is batch-only (``main.cron:1`` — daily at 01:17); its
high-watermark incremental pull (``py_scripts/cards.py:35-56``) is the batch
analog of streaming source offsets. This package is the streaming extension
(SURVEY §2.9 / §7 step 8): file-source streams over the events schema,
watermarked tumbling/sliding/session window aggregations, and a custom
stateful sessionizer built on ``applyInPandasWithState``.

Design rule: every window builder takes a plain DataFrame and works
unchanged on a batch frame or a streaming frame — the logical plan is the
same; only the sink/trigger differ. Batch runs double as the differential
oracle for the streaming runs.
"""

from etl_process_spark.streaming.sources import events_schema, read_event_stream  # noqa: F401
from etl_process_spark.streaming.windows import (  # noqa: F401
    session_agg,
    sliding_counts,
    tumbling_counts,
)
from etl_process_spark.streaming.stateful import (  # noqa: F401
    SESSION_SCHEMA,
    sessionize_batch,
    sessionize_stream,
)
from etl_process_spark.streaming.joins import (  # noqa: F401
    enrich_stream,
    time_bounded_join_batch,
    time_bounded_join_stream,
)
