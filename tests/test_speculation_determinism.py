"""Speculative-execution determinism: results must be bit-identical
when a straggling task's DUPLICATE attempt races it to commit.

Speculation needs a real multi-host topology (the scheduler refuses
same-host speculative placement, so ``local[N]`` AND
``local-cluster[...]`` both mark-but-never-launch duplicates), so the
suite runs tools/speculation_determinism.py in a SUBPROCESS that
manages its own standalone master + two workers pinned to distinct
loopback hostnames. ``--quick`` covers one Python-stage query (media
decode mapInPandas) and one scan-wrapped JVM query (iterative BPE) —
the full 12-query artifact is SPECULATION_DETERMINISM.json, refreshed
per round like the retry artifact.
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


def test_speculation_determinism_quick_subprocess():
    env = dict(os.environ)
    env["SPARK_GRAFT_DRIVER_MEM"] = env.get("SPARK_GRAFT_RETRY_MEM", "8g")
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "speculation_determinism.py"),
         SF_DIR, "--quick"],
        capture_output=True,
        text=True,
        timeout=1200,
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
        f"speculation-determinism failures: {json.dumps(bad, indent=1)}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    # both injection surfaces exercised: one Python-stage query plus one
    # JVM-side query. The JVM query's surface may legitimately be the
    # sql-result wrap — the harness falls back to it when the scan wrap
    # produces zero speculative attempts (SQL path-table reads bypass
    # DataFrameReader.parquet) — so accept either JVM injection kind;
    # the raced/hash assertions below stay the hard gate.
    kinds = {r["injection"] for r in summary["results"].values()}
    assert "python_stage" in kinds and kinds & {"scan", "sql"}, kinds
    for q, r in summary["results"].items():
        raced = (
            r.get("speculative_attempts_at_operator", 0) > 0
            or (r.get("eventlog") or {}).get("speculative_started", 0) > 0
        )
        assert raced, f"{q}: no speculative attempt was ever launched"


def test_suite_covers_every_python_stage_family(spark):
    """Every injection family observed ANYWHERE in the corpus must have
    at least one member in the 12-query rehearsal suite — a corpus
    addition that introduces a new Python-stage surface (e.g. grouped
    applyInPandas) must fail here instead of silently inheriting the
    suite's determinism claims."""
    from tools.family_census import corpus_census, query_families
    from tools.retry_determinism import JVM_QUERIES, PYTHON_FAMILIES

    sf_small = "/root/testdata/sf0.001"
    census = corpus_census(spark, sf_small)
    suite = PYTHON_FAMILIES + JVM_QUERIES
    suite_fams = {
        f for fams in query_families(spark, sf_small, suite).values()
        for f in fams
    }
    uncovered = set(census["universe"]) - suite_fams
    assert not uncovered, (
        f"corpus uses Python-stage families with NO rehearsal-suite "
        f"member: {sorted(uncovered)} — extend PYTHON_FAMILIES in "
        "tools/retry_determinism.py and refresh the speculation and "
        "executor-loss artifacts"
    )
