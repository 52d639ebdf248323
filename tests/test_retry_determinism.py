"""Task-retry determinism: results must be bit-identical when first
task attempts fail and Spark retries from lineage / shuffle blocks.

The rehearsal needs ``spark.task.maxFailures > 1``, which in local mode
is fixed at SparkContext creation (``local[N, maxFailures]``) — the
shared test session runs plain ``local[4]`` where any task failure is
fatal. So the suite runs tools/retry_determinism.py in a SUBPROCESS
with its own ``local[8, 3]`` context and asserts every covered query
(one per Python-stage family + the determinism-sensitive JVM queries:
md5 sampling gates, iterative loops, banded joins) hashes identically
with and without injected first-attempt failures.
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


def test_retry_determinism_subprocess():
    env = dict(os.environ)
    env["SPARK_GRAFT_DRIVER_MEM"] = env.get(
        "SPARK_GRAFT_RETRY_MEM", "8g"
    )  # a second JVM next to the test session; keep it modest
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "retry_determinism.py"), SF_DIR],
        capture_output=True,
        text=True,
        timeout=1800,
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
        f"retry-determinism failures: {json.dumps(bad, indent=1)}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    # the harness must actually have covered both injection surfaces
    kinds = {r["injection"] for r in summary["results"].values()}
    assert kinds == {"python_stage", "scan"}
    assert summary["n_queries"] >= 12
