"""Custom stateful streaming: gap-sessionization via applyInPandasWithState.

``session_agg`` (windows.py) covers standard gap sessions with the native
``session_window`` aggregate. This module is the template for semantics the
built-ins can't express (per-group imperative state machines): the same
sessionizer written as an ``applyInPandasWithState`` operator, plus its
batch twin (window functions) used as the differential oracle in tests.

State design for scale: state per key is ONE open session (4 scalars), not
the event history — memory is O(active keys). Closed sessions are emitted
as soon as the in-batch gap closes them or the event-time watermark passes
``last_ts + gap`` (event-time timeout), so state never grows with time.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value_e4 bigint"
)
# epoch-microsecond longs: engine-portable, no tz ambiguity in the state store
_STATE_SCHEMA = "session_start long, last_ts long, n_events long, total_value_e4 long"


def _e4(v: float) -> int:
    """Nearest-integer e4 quantization of one source double — the same
    value CAST(value AS DECIMAL(12,4)) * 10000 produces JVM-side (the
    data carries <= 4 decimals, so no representable tie exists)."""
    import math

    return int(math.floor(float(v) * 10000.0 + 0.5))


def _ceil_ms(us: int) -> int:
    """Microseconds -> milliseconds, rounded UP. Timer registration must
    ceil: timestamps carry microsecond precision but timers are
    millisecond-granular, and a floored timer fires up to 999us BEFORE
    the session's true close point — where a close-condition check
    against the watermark (also ms-granular) still fails and the close
    is lost. Ceiling guarantees a fired timer means the watermark passed
    ``last_ts + gap`` for real."""
    return -(-us // 1000)


def _emit(user_id: Any, ss: int, lt: int, n: int, tv: int, gap_us: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(ss, unit="us")],
            "session_end": [pd.Timestamp(lt + gap_us, unit="us")],
            "n_events": [n],
            "total_value_e4": [int(tv)],
        }
    )


def _make_sessionizer(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            ss, lt, n, tv = state.get
            state.remove()
            yield _emit(user_id, ss, lt, n, tv, gap_us)
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("ts", kind="mergesort")
        ts_us = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        vals = rows["value"].to_numpy()

        if state.exists:
            ss, lt, n, tv = state.get
        else:
            ss = None
            lt = n = 0
            tv = 0

        # exact integer e4 units: the running sum is addition of ints,
        # order-independent and bit-equal to the batch twin's DECIMAL sum
        closed: list[tuple[int, int, int, int]] = []
        for t, v in zip(ts_us, vals):
            t = int(t)
            if ss is None:
                ss, lt, n, tv = t, t, 1, _e4(v)
            elif t - lt >= gap_us:
                closed.append((ss, lt, n, tv))
                ss, lt, n, tv = t, t, 1, _e4(v)
            else:
                lt, n, tv = t, n + 1, tv + _e4(v)

        # If the watermark already passed the open session's close point,
        # a timeout in the past would be rejected — close it now instead.
        wm_us = state.getCurrentWatermarkMs() * 1000
        if ss is not None and lt + gap_us <= wm_us:
            closed.append((ss, lt, n, tv))
            state.remove()
        else:
            state.update((ss, lt, n, tv))
            state.setTimeoutTimestamp(_ceil_ms(lt + gap_us))

        for c in closed:
            yield _emit(user_id, *c, gap_us)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming gap-sessionizer (custom stateful operator).

    Emits one row per CLOSED session (append semantics): a session closes
    when a later event of the same key arrives ≥ gap after it, or when the
    event-time watermark passes ``last_ts + gap``.
    """
    src = events.withWatermark(ts_col, watermark)
    return src.groupBy(key_col).applyInPandasWithState(
        _make_sessionizer(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Batch gap-sessionization (gaps-and-islands) — the differential twin
    of ``sessionize_stream``: lag → new-session flag → running session id →
    per-session aggregate. Same output schema and close semantics
    (``session_end = last event + gap``)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    flagged = events.select(
        key_col,
        ts_col,
        value_col,
        order_col,
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (
                F.col(ts_col).cast("double") - F.lag(ts_col).over(w).cast("double")
                >= F.lit(float(gap_seconds))
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.withColumn("sid", F.sum("new_sess").over(w))
    return (
        sess.groupBy(key_col, "sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            (F.max(ts_col) + F.expr(f"INTERVAL {gap_seconds} SECOND")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.col(value_col).cast("decimal(12,4)")) * 10000)
            .cast("bigint").alias("total_value_e4"),
        )
        .select(
            key_col, "session_start", "session_end", "n_events",
            "total_value_e4",
        )
    )


def open_sessions_state(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Each user's LAST gap-session over a history corpus, as the
    epoch-microsecond state tuple (user_id, ss, lt, n, tv) the TWS
    sessionizer stores — the WARM-START input for
    ``sessionize_stream_tws(initial_state=...)``: bootstrap streaming
    state from a batch backfill instead of replaying history through the
    stream (the state-migration pattern of a production cutover)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    flagged = events.select(
        key_col, ts_col, value_col, order_col,
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (
                F.col(ts_col).cast("double") - F.lag(ts_col).over(w).cast("double")
                >= F.lit(float(gap_seconds))
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.withColumn("sid", F.sum("new_sess").over(w))
    agg = sess.groupBy(key_col, "sid").agg(
        F.min(F.unix_micros(F.col(ts_col))).alias("ss"),
        F.max(F.unix_micros(F.col(ts_col))).alias("lt"),
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.col(value_col).cast("decimal(12,4)")) * 10000)
        .cast("bigint").alias("tv"),
    )
    last = Window.partitionBy(key_col).orderBy(F.desc("sid"))
    return (
        agg.withColumn("rn", F.row_number().over(last))
        .filter(F.col("rn") == 1)
        .select(key_col, "ss", "lt", "n", "tv")
    )


def sessionize_stream_tws(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "0 seconds",
    initial_state=None,
) -> DataFrame:
    """The same gap-sessionizer on Spark 4's ``transformWithStateInPandas``
    — the successor API to ``applyInPandasWithState`` (SPARK-49564):
    named state variables instead of one tuple, explicit timer
    registration instead of a single timeout slot, and a processor class
    whose ``handleExpiredTimer`` separates timer logic from input logic.

    Behavioral contract is identical to ``sessionize_stream`` (append
    mode, close at ``last_ts + gap`` via event-time timer or a later
    event); the stream-vs-batch differential covers both operators.
    State per key: one (ss, lt, n, tv) value — O(active keys).

    Runtime dependency: Spark's transformWithState Python worker speaks a
    protobuf protocol (``StateMessage_pb2``), so this operator needs
    ``google.protobuf`` at runtime. Where the real package is absent
    (this container), ``session.get_spark`` activates the vendored
    pure-Python mini-runtime (``etl_process_spark/vendor``) before the
    JVM starts so workers inherit it; ``sessionize_stream`` has no such
    dependency either way.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_seconds * 1_000_000

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState(
                "sess", "ss long, lt long, n long, tv long"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            pdf = pd.concat(list(rows), ignore_index=True)
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            ts_us = pdf[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
            vals = pdf["value"].to_numpy()

            if self._state.exists():
                ss, lt, n, tv = self._state.get()
            else:
                ss, lt, n, tv = None, 0, 0, 0

            closed = []
            for t, v in zip(ts_us, vals):
                t = int(t)
                if ss is None:
                    ss, lt, n, tv = t, t, 1, _e4(v)
                elif t - lt >= gap_us:
                    closed.append((ss, lt, n, tv))
                    ss, lt, n, tv = t, t, 1, _e4(v)
                else:
                    lt, n, tv = t, n + 1, tv + _e4(v)

            wm_us = timerValues.getCurrentWatermarkInMs() * 1000
            if ss is not None and lt + gap_us <= wm_us:
                closed.append((ss, lt, n, tv))
                self._state.clear()
            else:
                self._state.update((ss, lt, n, tv))
                self._handle.registerTimer(_ceil_ms(lt + gap_us))

            for c in closed:
                yield _emit(user_id, *c, gap_us)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # Stale timers happen by design: extending a session registers
            # a later timer without deleting the earlier one. The close
            # authority is the WATERMARK, not the fired expiry: emit iff
            # the watermark passed the current session's close point. (A
            # stale timer firing after that point closes correctly; one
            # firing before it is ignored and the ceil-registered real
            # timer is still pending.) Comparing against the expiry
            # instead silently LOSES sessions: expiry is ms-truncated, so
            # for sub-ms timestamps it lands just before lt + gap and the
            # session's one real timer gets consumed without emitting.
            # (camelCase parameter names are the API contract: pyspark's
            # runner invokes with timerValues=/expiredTimerInfo= keywords)
            (user_id,) = key
            wm_us = timerValues.getCurrentWatermarkInMs() * 1000
            if self._state.exists():
                ss, lt, n, tv = self._state.get()
                if ss is not None and wm_us >= lt + gap_us:
                    self._state.clear()
                    yield _emit(user_id, ss, lt, n, tv, gap_us)

        def handleInitialState(self, key, initialState, timerValues):
            # warm start: adopt the backfilled open session as state and
            # arm its close timer — from here on the key behaves as if
            # the history had streamed through
            row = initialState.iloc[0]
            lt = int(row["lt"])
            self._state.update((int(row["ss"]), lt, int(row["n"]),
                                int(row["tv"])))
            self._handle.registerTimer(_ceil_ms(lt + gap_us))

        def close(self) -> None:
            pass

    src = events.withWatermark(ts_col, watermark)
    return src.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_SessionProcessor(),
        outputStructType=SESSION_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
        initialState=initial_state,
    )


TYPE_PROFILE_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, n_types long, top_type string, top_type_n long"
)


def _top_type(counts: dict) -> tuple[str, int]:
    """Deterministic session top type: max count, lexicographically
    smallest type on ties — mirrors the batch twin's
    min(struct(-cnt, type)) exactly."""
    return min(counts.items(), key=lambda kv: (-kv[1], kv[0]))


def session_type_profile_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Batch twin of ``session_type_profile_stream_tws``: gap sessions
    (gaps-and-islands) -> per-(session, type) counts -> per-session
    profile. ``top_type`` picks max count with smallest-type tie-break
    via min(struct(-cnt, type)) — engine-order-independent."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    flagged = events.select(
        key_col, ts_col, type_col, order_col,
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (
                F.col(ts_col).cast("double") - F.lag(ts_col).over(w).cast("double")
                >= F.lit(float(gap_seconds))
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.withColumn("sid", F.sum("new_sess").over(w))
    per_type = sess.groupBy(key_col, "sid", type_col).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(ts_col).alias("t0"),
        F.max(ts_col).alias("t1"),
    )
    return (
        per_type.groupBy(key_col, "sid")
        .agg(
            F.min("t0").alias("session_start"),
            (F.max("t1") + F.expr(f"INTERVAL {gap_seconds} SECOND")).alias(
                "session_end"
            ),
            F.sum("cnt").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            F.min(F.struct((-F.col("cnt")).alias("neg"),
                           F.col(type_col).alias("t"))).alias("top"),
        )
        .select(
            key_col, "session_start", "session_end", "n_events", "n_types",
            F.col("top.t").alias("top_type"),
            (-F.col("top.neg")).cast("long").alias("top_type_n"),
        )
    )


def session_type_profile_stream_tws(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Session-level TYPE PROFILE on ``transformWithStateInPandas``,
    exercising the parts of Spark 4's stateful API the sessionizer
    doesn't: a MapState variable (event_type -> running count, updated
    via containsKey/getValue/updateValue, drained via iterator()) next
    to a ValueState for the session bounds — the named-state-variables
    design that ``applyInPandasWithState``'s single tuple cannot
    express. One summary row per closed gap-session: distinct-type
    count and the modal event type (smallest type on count ties — the
    same deterministic pick as the batch twin).

    Close semantics identical to the sessionizers: a later event or an
    event-time timer at ``last_ts + gap``. State per key: O(active
    types), cleared on close. Speaks the same vendored-protobuf worker
    protocol (MapStateCall messages incl. the repeated-kvPair iterator
    responses)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_seconds * 1_000_000

    def _profile_row(user_id, ss, lt, counts):
        top_t, top_n = _top_type(counts)
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(ss, unit="us")],
                "session_end": [pd.Timestamp(lt + gap_us, unit="us")],
                "n_events": [int(sum(counts.values()))],
                "n_types": [len(counts)],
                "top_type": [top_t],
                "top_type_n": [int(top_n)],
            }
        )

    class _TypeProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._bounds = handle.getValueState("bounds", "ss long, lt long")
            self._types = handle.getMapState(
                "types", "event_type string", "cnt long"
            )

        def _drain_types(self) -> dict:
            counts = {t: int(c) for (t,), (c,) in self._types.iterator()}
            self._types.clear()
            return counts

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            pdf = pd.concat(list(rows), ignore_index=True)
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            ts_us = pdf[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
            types = pdf[type_col].to_numpy()

            if self._bounds.exists():
                ss, lt = self._bounds.get()
            else:
                ss, lt = None, 0

            for t, et in zip(ts_us, types):
                t = int(t)
                if ss is not None and t - lt >= gap_us:
                    yield _profile_row(user_id, ss, lt, self._drain_types())
                    ss = None
                if ss is None:
                    ss, lt = t, t
                else:
                    lt = t
                k = (str(et),)
                if self._types.containsKey(k):
                    (prev,) = self._types.getValue(k)
                    self._types.updateValue(k, (int(prev) + 1,))
                else:
                    self._types.updateValue(k, (1,))

            wm_us = timerValues.getCurrentWatermarkInMs() * 1000
            if ss is not None and lt + gap_us <= wm_us:
                yield _profile_row(user_id, ss, lt, self._drain_types())
                self._bounds.clear()
            else:
                self._bounds.update((ss, lt))
                self._handle.registerTimer(_ceil_ms(lt + gap_us))

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # watermark-authoritative close (see _SessionProcessor): the
            # ms-truncated expiry must not be the staleness test
            (user_id,) = key
            wm_us = timerValues.getCurrentWatermarkInMs() * 1000
            if self._bounds.exists():
                ss, lt = self._bounds.get()
                if ss is not None and wm_us >= lt + gap_us:
                    self._bounds.clear()
                    yield _profile_row(user_id, ss, lt, self._drain_types())

        def close(self) -> None:
            pass

    src = events.withWatermark(ts_col, watermark)
    return src.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_TypeProfileProcessor(),
        outputStructType=TYPE_PROFILE_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )


SESSION_TRACE_SCHEMA = (
    "user_id long, session_start timestamp, n_events long, "
    "first_event_id long, last_event_id long, id_checksum long"
)


def session_trace_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    order_col: str = "event_id",
) -> DataFrame:
    """Batch twin of ``session_trace_stream_tws``: per gap-session the
    event-id trace summary — first/last id in (ts, id) order and the
    order-independent integer checksum (sum of ids)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    flagged = events.select(
        key_col, ts_col, order_col,
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (
                F.col(ts_col).cast("double") - F.lag(ts_col).over(w).cast("double")
                >= F.lit(float(gap_seconds))
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.withColumn("sid", F.sum("new_sess").over(w))
    first_last = Window.partitionBy(key_col, "sid").orderBy(ts_col, order_col)
    traced = sess.select(
        key_col, "sid", ts_col, order_col,
        F.first(order_col).over(first_last).alias("first_event_id"),
    )
    return (
        traced.groupBy(key_col, "sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.min("first_event_id").alias("first_event_id"),
            F.max_by(order_col, F.struct(ts_col, order_col)).alias(
                "last_event_id"
            ),
            F.sum(order_col).alias("id_checksum"),
        )
        .select(
            key_col, "session_start", "n_events", "first_event_id",
            "last_event_id", "id_checksum",
        )
    )


def session_trace_stream_tws(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    order_col: str = "event_id",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Session EVENT TRACE on ``transformWithStateInPandas`` — the
    ListState leg of the named-state-variable triple (ValueState:
    sessionizer; MapState: type profile). A ListState accumulates the
    session's (ts, event_id) pairs via ``appendList``; on close the
    trace drains through the paginated list-get protocol
    (StateResponseWithListGet + requireNextFetch) and one summary row is
    emitted: first/last event id in (ts, id) order plus the integer
    id-checksum. Close semantics identical to the sessionizers.

    State per key is O(session events) — the honest cost of trace
    semantics (unlike the O(1) sessionizer); the gap timer bounds its
    lifetime."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_seconds * 1_000_000

    def _trace_row(user_id, items):
        # items: list of (ts_us, event_id), drained from ListState
        items = sorted(items)
        ss = items[0][0]
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(ss, unit="us")],
                "n_events": [len(items)],
                "first_event_id": [int(items[0][1])],
                "last_event_id": [int(items[-1][1])],
                "id_checksum": [int(sum(i for _, i in items))],
            }
        )

    class _TraceProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._last = handle.getValueState("last", "lt long")
            self._trace = handle.getListState("trace", "ts long, eid long")

        def _drain(self):
            items = [(int(t), int(e)) for t, e in self._trace.get()]
            self._trace.clear()
            return items

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            pdf = pd.concat(list(rows), ignore_index=True)
            pdf = pdf.sort_values([ts_col, order_col], kind="mergesort")
            ts_us = pdf[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
            eids = pdf[order_col].to_numpy()

            lt = self._last.get()[0] if self._last.exists() else None
            pending = []
            for t, e in zip(ts_us, eids):
                t = int(t)
                if lt is not None and t - lt >= gap_us:
                    if pending:
                        self._trace.appendList(pending)
                        pending = []
                    yield _trace_row(user_id, self._drain())
                    lt = None
                pending.append((t, int(e)))
                lt = t
            if pending:
                self._trace.appendList(pending)

            wm_us = timerValues.getCurrentWatermarkInMs() * 1000
            if lt is not None and lt + gap_us <= wm_us:
                yield _trace_row(user_id, self._drain())
                self._last.clear()
            else:
                self._last.update((lt,))
                self._handle.registerTimer(_ceil_ms(lt + gap_us))

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # watermark-authoritative close (see _SessionProcessor): the
            # ms-truncated expiry must not be the staleness test
            (user_id,) = key
            wm_us = timerValues.getCurrentWatermarkInMs() * 1000
            if self._last.exists():
                (lt,) = self._last.get()
                if lt is not None and wm_us >= lt + gap_us:
                    self._last.clear()
                    yield _trace_row(user_id, self._drain())

        def close(self) -> None:
            pass

    src = events.withWatermark(ts_col, watermark)
    return src.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_TraceProcessor(),
        outputStructType=SESSION_TRACE_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
