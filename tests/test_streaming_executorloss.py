"""Streaming executor-loss determinism: a stateful streaming query must
produce bit-identical committed output when a worker (and the executor
holding its state-store instances and in-flight sink files) is
SIGKILLed mid-micro-batch while the query keeps RUNNING — the other
half of the recovery story next to the checkpoint-restart suite.

Needs a real multi-process topology (an in-test executor can't be
killed without killing the test JVM), so the smoke runs
tools/streaming_executorloss.py in a SUBPROCESS managing its own
standalone master + two workers. ``--quick`` covers one JVM state
mechanism (tumbling windowed agg, HDFS-backed provider) and one
Python stateful operator (applyInPandasWithState sessionizer). The
full 4-query artifact — adding the RocksDB dropDuplicates and
transformWithStateInPandas legs — is STREAMING_EXECUTORLOSS.json,
refreshed per round like the other determinism artifacts.
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


def test_streaming_executorloss_quick_subprocess():
    env = dict(os.environ)
    env["SPARK_GRAFT_DRIVER_MEM"] = env.get("SPARK_GRAFT_RETRY_MEM", "8g")
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "streaming_executorloss.py"),
         "--quick"],
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
        f"streaming executor-loss failures: {json.dumps(bad, indent=1)}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    results = summary["results"]
    # the cluster must really have lost executors
    assert summary["executors_removed_total"] >= len(results)
    for q, r in results.items():
        inj = r["injected"]
        assert inj["kill"]["killed"], f"{q}: no worker killed"
        # non-vacuous: the query kept running and finished the backlog
        # on the surviving executor
        assert r["batches_after_kill"] >= 1, (q, r)
        assert r["hash_match"], (q, r)
        # state was genuinely exercised across the kill
        assert r["state_rows_updated_injected"] > 0, (q, r)
