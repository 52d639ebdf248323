"""Sequential-pattern detection: streaming twin of the reference's rule 4.

Reference ``py_scripts/report.py:109-113`` flags a SUCCESS after three
REJECTs with strictly decreasing amounts inside 20 minutes — a per-key
event-time sequence pattern. In batch that is lag columns over a window
(see ``decreasing_runs`` in queries/streams.py); on a stream the same
semantics need custom state: the last k-1 observations per key.

State design: a bounded ring of (ts, value) pairs per key — O(k) per
active key, evicted by event-time timeout once the watermark passes the
pattern window. Alerts are emitted the moment the k-th event arrives (no
watermark gating on output), so stream and batch agree exactly when
input arrives in event-time order.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_SCHEMA = "user_id bigint, event_id bigint, ts timestamp, run_start timestamp"
_STATE_SCHEMA = "ts array<long>, v array<double>"


def _make_detector(k: int, window_us: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        vals = rows["value"].to_numpy()
        ids = rows["event_id"].to_numpy()

        hist_ts: list[int]
        hist_v: list[float]
        if state.exists:
            st = state.get
            hist_ts, hist_v = list(st[0]), list(st[1])
        else:
            hist_ts, hist_v = [], []

        out_user, out_id, out_ts, out_start = [], [], [], []
        for t, v, eid in zip(ts_us, vals, ids):
            t = int(t)
            hist_ts.append(t)
            hist_v.append(float(v))
            if len(hist_ts) > k:
                hist_ts.pop(0)
                hist_v.pop(0)
            if (
                len(hist_ts) == k
                and all(hist_v[i] > hist_v[i + 1] for i in range(k - 1))
                and t - hist_ts[0] <= window_us
            ):
                out_user.append(user_id)
                out_id.append(int(eid))
                out_ts.append(pd.Timestamp(t, unit="us"))
                out_start.append(pd.Timestamp(hist_ts[0], unit="us"))

        state.update((hist_ts, hist_v))
        state.setTimeoutTimestamp((hist_ts[-1] + window_us) // 1000)
        if out_user:
            yield pd.DataFrame(
                {
                    "user_id": out_user,
                    "event_id": out_id,
                    "ts": out_ts,
                    "run_start": out_start,
                }
            )

    return fn


def decreasing_run_stream(
    events: DataFrame,
    k: int = 3,
    window_seconds: int = 6 * 3600,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming decreasing-run detector (custom stateful operator).

    Emits one alert per event that completes a strictly-decreasing run of
    k values within ``window_seconds`` for its key.
    """
    src = events.withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        _make_detector(k, window_seconds * 1_000_000),
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def decreasing_run_batch(
    events: DataFrame, k: int = 3, window_seconds: int = 6 * 3600
) -> DataFrame:
    """Batch twin via lag columns (the reference's own formulation)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags_v = [F.lag("value", i).over(w) for i in range(1, k)]
    start_ts = F.lag("ts", k - 1).over(w)
    df = events.select(
        "user_id", "event_id", "ts", "value",
        *[lv.alias(f"v{i}") for i, lv in enumerate(lags_v, start=1)],
        start_ts.alias("run_start"),
    )
    chain = F.col("value") < F.col("v1")
    for i in range(1, k - 1):
        chain = chain & (F.col(f"v{i}") < F.col(f"v{i + 1}"))
    # exact integer microsecond arithmetic (a double epoch diff would
    # round at ~μs precision and could disagree with the stream/oracle)
    in_window = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("run_start"))
        <= F.lit(window_seconds * 1_000_000)
    )
    return df.filter(chain & in_window).select("user_id", "event_id", "ts", "run_start")


FUNNEL_SCHEMA = (
    "user_id bigint, t1 timestamp, t2 timestamp, t3 timestamp, t4 timestamp"
)
_FUNNEL_STATE = "step int, reached array<long>"
FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def _make_funnel(steps: tuple[str, ...]):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        types = rows["event_type"].to_numpy()

        if state.exists:
            st = state.get
            step, reached = int(st[0]), list(st[1])
        else:
            step, reached = 0, []

        done = None
        for t, ty in zip(ts_us, types):
            if step >= len(steps):
                break
            t = int(t)
            if ty == steps[step] and (step == 0 or t > reached[-1]):
                reached.append(t)
                step += 1
                if step == len(steps):
                    done = reached
        state.update((step, reached))
        if done is not None:
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    **{
                        f"t{i + 1}": [pd.Timestamp(done[i], unit="us")]
                        for i in range(len(steps))
                    },
                }
            )

    return fn


def funnel_stream(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming ordered-funnel detector (custom stateful operator): per
    user, advance a step cursor on the FIRST event of the next step type
    strictly after the previous step's timestamp; emit one completion row
    with all step timestamps the moment the last step is reached.

    State per key is O(steps): a cursor + the reached timestamps — the
    streaming dual of ``funnel_conversion``'s window mins, and the reason
    a funnel over an unbounded stream never re-reads history. Completed
    users freeze (cursor = len(steps)), so re-deliveries and later events
    can't re-emit. Emission is on arrival, not watermark-gated: with
    event-time-ordered input the output equals the batch twin exactly.
    """
    src = events.withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        _make_funnel(tuple(steps)),
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_batch(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Batch twin: consecutive whole-partition window mins (the
    ``funnel_conversion`` construction), completed users only."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    df = events.select("user_id", "event_type", "ts")
    prev = None
    for i, step in enumerate(steps, start=1):
        cond = F.col("event_type") == step
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() & (F.col("ts") > F.col(prev))
        df = df.withColumn(f"t{i}", F.min(F.when(cond, F.col("ts"))).over(w))
        prev = f"t{i}"
    names = [f"t{i}" for i in range(1, len(steps) + 1)]
    return (
        df.groupBy("user_id")
        .agg(*[F.max(n).alias(n) for n in names])
        .where(F.col(names[-1]).isNotNull())
    )
