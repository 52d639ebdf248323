"""Property tests for the behavior-analytics queries: random event
streams vs straight-line Python references (ordering ties, missing
steps, and window-boundary cases the two fixed testdata sets may not
contain)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_process_spark.queries import QUERIES

T0 = dt.datetime(2024, 1, 1)
TYPES = ("signup", "view", "click", "purchase", "error")
FUNNEL = ("signup", "view", "click", "purchase")

# (user, type index, seconds offset) — offsets repeat, so same-timestamp
# ties across users and within a user's stream are generated
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=len(TYPES) - 1),
        st.integers(min_value=0, max_value=20 * 86400),
    ),
    min_size=1,
    max_size=40,
)


def _write_events(tmp_path, rows):
    recs = [
        {
            "event_id": i,
            "ts": T0 + dt.timedelta(seconds=sec),
            "user_id": u,
            "event_type": TYPES[t],
            "value": float(i % 7),
            "props": "{}",
        }
        for i, (u, t, sec) in enumerate(rows)
    ]
    table = pa.Table.from_pylist(
        recs,
        schema=pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _funnel_reference(rows):
    per_user: dict[int, list[tuple]] = {}
    for i, (u, t, sec) in enumerate(rows):
        per_user.setdefault(u, []).append((TYPES[t], sec))
    counts = [0, 0, 0, 0]
    for evs in per_user.values():
        prev = None
        for step_i, step in enumerate(FUNNEL):
            cand = [
                s
                for (ty, s) in evs
                if ty == step and (prev is None or s > prev)
            ]
            if not cand:
                break
            prev = min(cand)
            counts[step_i] += 1
    return counts


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
def test_funnel_matches_reference(spark, tmp_path_factory, rows):
    sf_dir = _write_events(tmp_path_factory.mktemp("ev"), rows)
    got = {
        r["step_no"]: r["users"]
        for r in QUERIES["funnel_conversion"].builder(spark, sf_dir).collect()
    }
    want = _funnel_reference(rows)
    assert [got[i] for i in (1, 2, 3, 4)] == want


def _attribution_reference(rows):
    evs = [
        (u, TYPES[t], sec, i) for i, (u, t, sec) in enumerate(rows)
    ]
    out: dict[str, int] = {}
    for u, ty, sec, i in evs:
        if ty != "purchase":
            continue
        cands = [
            (s2, i2, ty2)
            for (u2, ty2, s2, i2) in evs
            if u2 == u
            and (s2, i2) < (sec, i)
            and ty2 != "purchase"
            and s2 >= sec - 7 * 86400
        ]
        if cands:
            _, _, channel = max(cands)
            out[channel] = out.get(channel, 0) + 1
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
def test_last_touch_attribution_matches_reference(
    spark, tmp_path_factory, rows
):
    sf_dir = _write_events(tmp_path_factory.mktemp("ev"), rows)
    got = {
        r["channel"]: r["purchases"]
        for r in QUERIES["last_touch_attribution"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert got == _attribution_reference(rows)
