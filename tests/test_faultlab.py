"""Unit contracts for tools/faultlab — the shared fault-rehearsal core.

These are pure (no cluster): the hash must stay aligned with the
differential's canonicalization, the event-log parser must attribute
evidence to the right job group across rolling logs, and tier-leg
merging must never clobber the base suite's results.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools import faultlab  # noqa: E402


def test_canon_hash_matches_differential_recipe():
    # same rows, any order -> same hash; value change -> different hash
    h1 = faultlab.canon_hash(["a", "b"], [(1, "x"), (2, "y")])
    h2 = faultlab.canon_hash(["a", "b"], [(2, "y"), (1, "x")])
    h3 = faultlab.canon_hash(["a", "b"], [(1, "x"), (2, "z")])
    assert h1 == h2
    assert h1 != h3


def test_merge_tier_leg_preserves_base(tmp_path):
    out = tmp_path / "ART.json"
    base = {"n_ok": 12, "results": {"q": {"ok": True}}}
    out.write_text(json.dumps(base))
    faultlab.merge_tier_leg(out, {"n_ok": 4}, key="tier_10x")
    doc = json.loads(out.read_text())
    assert doc["n_ok"] == 12 and doc["results"]["q"]["ok"]
    assert doc["tier_10x"] == {"n_ok": 4}
    # merging another leg keeps the first
    faultlab.merge_tier_leg(out, {"n_ok": 3}, key="fallback_leg")
    doc = json.loads(out.read_text())
    assert doc["tier_10x"] == {"n_ok": 4}
    assert doc["fallback_leg"] == {"n_ok": 3}


def test_merge_tier_leg_creates_file(tmp_path):
    out = tmp_path / "NEW.json"
    faultlab.merge_tier_leg(out, {"n_ok": 1})
    assert json.loads(out.read_text()) == {"tier_10x": {"n_ok": 1}}


def _ev(obj) -> str:
    return json.dumps(obj) + "\n"


def test_parse_eventlog_groups(tmp_path):
    log = tmp_path / "app-1"
    lines = [
        _ev({"Event": "SparkListenerJobStart",
             "Properties": {"spark.jobGroup.id": "loss::q1"},
             "Stage IDs": [0, 1]}),
        # attempt 1 of stage 0 -> a resubmitted stage for q1
        _ev({"Event": "SparkListenerStageSubmitted",
             "Stage Info": {"Stage ID": 0, "Stage Attempt ID": 0}}),
        _ev({"Event": "SparkListenerStageSubmitted",
             "Stage Info": {"Stage ID": 0, "Stage Attempt ID": 1}}),
        _ev({"Event": "SparkListenerTaskEnd", "Stage ID": 1,
             "Task End Reason": {"Reason": "FetchFailed"}}),
        _ev({"Event": "SparkListenerTaskEnd", "Stage ID": 1,
             "Task End Reason": {"Reason": "Success"}}),
        _ev({"Event": "SparkListenerTaskEnd", "Stage ID": 0,
             "Task End Reason": {"Reason": "Resubmitted"}}),
        # a different group's task must not leak into q1
        _ev({"Event": "SparkListenerJobStart",
             "Properties": {"spark.jobGroup.id": "base::q2"},
             "Stage IDs": [7]}),
        _ev({"Event": "SparkListenerTaskEnd", "Stage ID": 7,
             "Task End Reason": {"Reason": "ExecutorLostFailure"}}),
        _ev({"Event": "SparkListenerExecutorRemoved"}),
    ]
    log.write_text("".join(lines))
    out = faultlab.parse_eventlog_groups(str(tmp_path))
    q1 = out["loss::q1"]
    assert q1["fetch_failed"] == 1
    assert q1["resubmitted_stages"] == 1
    assert q1["resubmitted_tasks"] == 1
    assert q1["executor_lost_tasks"] == 0
    assert out["base::q2"]["executor_lost_tasks"] == 1
    assert out[""]["executors_removed"] == 1


def test_eventlog_counts(tmp_path):
    (tmp_path / "app").write_text(
        _ev({"Event": "SparkListenerExecutorRemoved"})
        + _ev({"Event": "SparkListenerTaskEnd",
               "Task End Reason": {"Reason": "FetchFailed"}}))
    out = faultlab.eventlog_counts(str(tmp_path))
    assert out == {"executors_removed": 1, "fetch_failed": 1}


def test_reexports_stay_aligned():
    """The decommission/streaming harnesses and the contract tests
    import these under the old names from executorloss_determinism —
    the re-export must be the SAME objects, not copies that could
    drift."""
    from tools import executorloss_determinism as ex

    assert ex._canon_hash is faultlab.canon_hash
    assert ex._parse_eventlog is faultlab.parse_eventlog_groups
    assert ex._wait_executors is faultlab.wait_executors
    assert ex._run_wrapped is faultlab.run_wrapped
    assert ex.merge_tier_leg is faultlab.merge_tier_leg
