"""The committed BENCH.json must be a SERIAL measurement.

The round-8/9 drift investigation (BENCH_DRIFT.md) proved the only
trustworthy perf record is a serial run on an otherwise-idle host: the
per-round driver reruns bench.py in parallel with its own verify jobs
and freely overwrites BENCH.json with contended numbers. bench.py now
stamps every artifact with a ``provenance`` field ("serial" only when
SPARK_GRAFT_BENCH_SERIAL=1 was set by the operator); this test makes an
unattended overwrite loud at the next pytest run instead of silently
becoming the baseline future rounds diff against.
"""

from __future__ import annotations

import json
from pathlib import Path

BENCH = Path(__file__).resolve().parent.parent / "BENCH.json"


def test_committed_bench_is_serial():
    doc = json.loads(BENCH.read_text())
    assert doc.get("provenance") == "serial", (
        f"BENCH.json provenance={doc.get('provenance')!r} — the repo's "
        "perf baseline was overwritten by a non-serial run; refresh it "
        "with SPARK_GRAFT_BENCH_SERIAL=1 python bench.py on an idle host"
    )


def test_bench_has_full_query_map():
    doc = json.loads(BENCH.read_text())
    assert doc["unit"] == "sec" and doc["value"] > 0
    assert len(doc["queries"]) >= 200, "per-query map lost (truncated?)"
