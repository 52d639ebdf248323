"""Executor-loss determinism: results must be bit-identical after a
worker (and its executor, shuffle blocks, and checkpoint blocks) is
SIGKILLed mid-query.

Needs a real multi-process topology (an executor in the test JVM
cannot be killed without killing the test), so the suite runs
tools/executorloss_determinism.py in a SUBPROCESS managing its own
standalone master + two workers. ``--quick`` covers one
stage-resubmission query (grouped sketch — in-flight recovery with
FetchFailed/resubmission evidence) and one localCheckpoint query (BFS
— designed fail-fast + deterministic job retry, plus the
SPARK_GRAFT_CHECKPOINT_REPLICAS=2 in-flight leg). The full 12-query
artifact is EXECUTORLOSS_DETERMINISM.json, refreshed per round like
the retry and speculation artifacts.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: excluded from the driver-budget default selection (see pytest.ini)

REPO = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")


def test_executorloss_determinism_quick_subprocess():
    env = dict(os.environ)
    env["SPARK_GRAFT_DRIVER_MEM"] = env.get("SPARK_GRAFT_RETRY_MEM", "8g")
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "executorloss_determinism.py"),
         SF_DIR, "--quick"],
        capture_output=True,
        text=True,
        timeout=1500,
        env=env,
        cwd=str(REPO),
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no output from harness:\n{proc.stdout}\n{proc.stderr[-2000:]}"
    summary = json.loads(lines[-1])
    bad = {
        q: r for q, r in summary.get("results", {}).items() if not r.get("ok")
    }
    assert proc.returncode == 0 and not bad, (
        f"executor-loss determinism failures: {json.dumps(bad, indent=1)}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    results = summary["results"]
    # both designed recovery paths must be exercised by the smoke
    recoveries = {r.get("recovery") for r in results.values()}
    assert recoveries == {"stage_resubmission", "job_retry"}, recoveries
    # in-flight recovery must carry event-log proof it actually
    # depended on the dead worker
    for q, r in results.items():
        assert r["injected"]["kill"].get("killed"), f"{q}: no worker killed"
        if r.get("recovery") == "stage_resubmission":
            ev = r.get("eventlog") or {}
            assert (ev.get("fetch_failed") or ev.get("resubmitted_stages")
                    or ev.get("resubmitted_tasks")
                    or ev.get("executor_lost_tasks")), (q, ev)
    # the localCheckpoint query must also prove the replicated-mode
    # in-flight survival
    ckpt = [r for r in results.values() if r.get("recovery") == "job_retry"]
    assert any(r.get("replicated_leg", {}).get("ok") for r in ckpt), (
        "no localCheckpoint query proved in-flight survival with "
        "SPARK_GRAFT_CHECKPOINT_REPLICAS=2"
    )
