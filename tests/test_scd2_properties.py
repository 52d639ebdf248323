"""Property-based SCD2 invariants (SURVEY §5 item 4).

Hypothesis drives random multi-day sequences of upserts / deletes /
resurrections through scd2_merge and asserts the timeline invariants that
define SCD2 correctness, independent of any specific fixture:

* per key: exactly one OPEN version (effective_to = infinity)
* closed versions end exactly 1 second before their successor opens
  (the reference's `-1 second` close, terminals.py:134)
* version intervals are non-overlapping and ordered
* the current version reflects the latest observed state
* re-applying the final batch is a no-op (idempotent merge)
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_process_spark.operators.scd2 import scd2_current, scd2_init, scd2_merge
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: excluded from the driver-budget default selection (see pytest.ini)

INF = dt.datetime(9999, 12, 31)
KEYS = ["k1", "k2", "k3"]

# One "day" of source state: key -> value (absent key = deleted from source).
# Values include None so null-safe change detection is exercised.
day_state = st.dictionaries(
    st.sampled_from(KEYS),
    st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
    min_size=0,
    max_size=len(KEYS),
)
histories = st.lists(day_state, min_size=1, max_size=4)


def _day_ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=i)


def _mk_batch(spark, state: dict, ts: dt.datetime):
    rows = [(k, v, ts) for k, v in sorted(state.items())]
    return spark.createDataFrame(rows, "k string, v int, batch_ts timestamp")


def _materialize(spark, df):
    """Collect + recreate: cuts the per-day lineage chain so N merges cost
    N small jobs, not one exponentially re-analyzed plan."""
    rows = [tuple(r) for r in df.collect()]
    schema = "k string, v int, effective_from timestamp, effective_to timestamp, deleted_flg string"
    return spark.createDataFrame(rows, schema), rows


def _run_history(spark, days: list[dict]):
    ts0 = _day_ts(0)
    dim = scd2_init(_mk_batch(spark, days[0], ts0), "k", ["v"], F.col("batch_ts"))
    dim, rows = _materialize(spark, dim)
    last_batch = None
    for i, state in enumerate(days[1:], start=1):
        ts = _day_ts(i)
        batch = _mk_batch(spark, state, ts)
        dim = scd2_merge(
            dim,
            batch,
            "k",
            ["v"],
            new_effective_from=F.col("batch_ts"),
            changed_effective_from=F.col("batch_ts"),
            source_keys=batch.select("k"),
            clock=ts,
        )
        dim, rows = _materialize(spark, dim)
        last_batch = (state, ts)
    return dim, rows, last_batch


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(days=histories)
def test_scd2_timeline_invariants(spark, days):
    dim, rows, _ = _run_history(spark, days)

    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)

    # which keys ever appeared
    seen = set().union(*[set(d) for d in days]) if days else set()
    assert set(by_key) == seen

    # final truth: last state in which each key appeared, and whether it
    # was deleted afterwards (absent from a later day's source)
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r[2])  # by effective_from
        opens = [r for r in versions if r[3] == INF]
        assert len(opens) == 1, f"{k}: exactly one open version, got {versions}"

        # ordered, non-overlapping, -1s closes against the successor
        for a, b in zip(versions, versions[1:]):
            assert a[2] <= a[3], f"{k}: inverted interval {a}"
            assert a[3] == b[2] - dt.timedelta(seconds=1), (
                f"{k}: close must be 1s before successor open: {a} -> {b}"
            )

        # current content matches the latest source observation
        last_day_present = max(i for i, d in enumerate(days) if k in d)
        deleted_after = any(k not in d for d in days[last_day_present + 1:])
        cur = opens[0]
        if deleted_after:
            assert cur[4] == "Y", f"{k}: should be tombstoned, got {cur}"
        else:
            assert cur[4] == "N"
            assert cur[1] == days[last_day_present][k], f"{k}: stale current {cur}"


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(days=histories.filter(lambda d: len(d) >= 2))
def test_scd2_merge_idempotent(spark, days):
    dim, rows, last = _run_history(spark, days)
    state, ts = last
    again = scd2_merge(
        dim,
        _mk_batch(spark, state, ts),
        "k",
        ["v"],
        new_effective_from=F.col("batch_ts"),
        changed_effective_from=F.col("batch_ts"),
        source_keys=_mk_batch(spark, state, ts).select("k"),
        clock=ts,
    )
    canon = lambda rs: sorted((tuple(r) for r in rs), key=repr)  # noqa: E731 (None-safe sort)
    assert canon(again.collect()) == canon(rows)


def test_scd2_current_filters_tombstones(spark):
    days = [{"k1": 1, "k2": 2}, {"k1": 1}]
    dim, _, _ = _run_history(spark, days)
    cur = {r["k"] for r in scd2_current(dim).collect()}
    assert cur == {"k1"}
    cur_all = {r["k"] for r in scd2_current(dim, include_deleted=True).collect()}
    assert cur_all == {"k1", "k2"}


def _run_history_no_deletes(spark, days: list[dict]):
    """Chronological merges WITHOUT delete detection (rebuild has no
    source-snapshot concept, so the equivalence universe is upsert-only)."""
    dim = scd2_init(_mk_batch(spark, days[0], _day_ts(0)), "k", ["v"], F.col("batch_ts"))
    dim, rows = _materialize(spark, dim)
    for i, state in enumerate(days[1:], start=1):
        dim = scd2_merge(
            dim,
            _mk_batch(spark, state, _day_ts(i)),
            "k",
            ["v"],
            new_effective_from=F.col("batch_ts"),
            changed_effective_from=F.col("batch_ts"),
        )
        dim, rows = _materialize(spark, dim)
    return rows


def _materialize_log(spark, df):
    rows = [tuple(r) for r in df.collect()]
    schema = "k string, v int, effective_from timestamp, deleted_flg string"
    return spark.createDataFrame(rows, schema), rows


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=st.data(), days=histories.filter(lambda d: len(d) >= 2))
def test_scd2_rebuild_log_is_order_independent(spark, data, days):
    """Applying day batches in ANY order through the log-backed rebuild
    yields the same history as chronological scd2_merge application —
    the property that makes late CDC data safe. (The dimension-only
    scd2_rebuild provably CANNOT have this property: consolidating a
    confirming observation destroys information a later retro-insertion
    needs — hypothesis found the counterexample, pinned below.)"""
    from etl_process_spark.operators.scd2 import scd2_rebuild_log

    in_order = _run_history_no_deletes(spark, days)

    perm = data.draw(st.permutations(list(range(len(days)))))
    log = _mk_batch(spark, {}, _day_ts(0)).withColumnRenamed(
        "batch_ts", "effective_from"
    ).withColumn("deleted_flg", F.lit("N")).select(
        "k", "v", "effective_from", "deleted_flg"
    )
    dim_rows = []
    for i in perm:
        late = _mk_batch(spark, days[i], _day_ts(i)).withColumnRenamed(
            "batch_ts", "effective_from"
        )
        dim, log = scd2_rebuild_log(log, late, "k", ["v"])
        log, _ = _materialize_log(spark, log)
        _, dim_rows = _materialize(spark, dim)

    canon = lambda rs: sorted((tuple(r) for r in rs), key=repr)  # noqa: E731
    assert canon(dim_rows) == canon(in_order), (days, perm)


def test_scd2_dim_only_rebuild_counterexample_fixed_by_log(spark):
    """The hypothesis-found case: confirm(None@d3) is consolidated away by
    the dim-only rebuild, so when 0@d2 then arrives late the None@d3
    observation is lost. The log-backed rebuild keeps it."""
    from etl_process_spark.operators.scd2 import scd2_rebuild_log

    days = [{"k3": None}, {"k3": 0}, {"k1": None, "k3": None}, {}]
    in_order = _run_history_no_deletes(spark, days)

    log = spark.createDataFrame(
        [], "k string, v int, effective_from timestamp, deleted_flg string"
    )
    for i in (0, 2, 1, 3):  # the falsifying permutation
        late = _mk_batch(spark, days[i], _day_ts(i)).withColumnRenamed(
            "batch_ts", "effective_from"
        )
        dim, log = scd2_rebuild_log(log, late, "k", ["v"])
        log, _ = _materialize_log(spark, log)

    canon = lambda rs: sorted((tuple(r) for r in rs), key=repr)  # noqa: E731
    assert canon(dim.collect()) == canon(in_order)


def test_scd2_rebuild_log_affected_key_split_matches_full_replay(spark):
    """Passing the prior dimension restricts the window passes to the
    late batch's keys; the result (both dim and log) must be identical
    to the full-replay path — untouched keys pass through unchanged."""
    from etl_process_spark.operators.scd2 import scd2_rebuild_log

    days = [
        {"a": 1, "b": 10, "c": 100},
        {"a": 2, "c": 100},          # confirm c, change a
        {"b": 11},
    ]
    empty = spark.createDataFrame(
        [], "k string, v int, effective_from timestamp, deleted_flg string"
    )
    # seed: apply day 0 and day 2 first (day 1 arrives late)
    log = empty
    for i in (0, 2):
        late = _mk_batch(spark, days[i], _day_ts(i)).withColumnRenamed(
            "batch_ts", "effective_from"
        )
        dim, log = scd2_rebuild_log(log, late, "k", ["v"])
        log, _ = _materialize_log(spark, log)
    dim, dim_rows = _materialize(spark, dim)

    late = _mk_batch(spark, days[1], _day_ts(1)).withColumnRenamed(
        "batch_ts", "effective_from"
    )
    # incremental: prior dim passed, only keys {a, c} re-windowed
    inc_dim, inc_log = scd2_rebuild_log(log, late, "k", ["v"], dim=dim)
    # full replay: no dim
    full_dim, full_log = scd2_rebuild_log(log, late, "k", ["v"])

    canon = lambda df: sorted((tuple(r) for r in df.collect()), key=repr)  # noqa: E731
    assert canon(inc_dim) == canon(full_dim)
    assert canon(inc_log) == canon(full_log)
    # untouched key b kept its two versions verbatim
    b_rows = [r for r in inc_dim.collect() if r["k"] == "b"]
    assert len(b_rows) == 2
