"""The examples/quickstart.py script must keep running end-to-end —
the example IS a regression test, so the on-ramp can never rot."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def test_quickstart_runs_all_five_surfaces(spark, tmp_path):
    import quickstart

    out = quickstart.run(spark, "/root/testdata/sf0.001", str(tmp_path))
    assert out["sql_top_priorities"] == out["df_top_priorities"]
    assert out["scd2_versions"] == 4        # alice x2, bob, cara
    assert out["scd2_current"] == 3
    assert out["time_travel_v0"] == 2
    assert out["neardup_pairs"] >= 0
    assert out["stream_windows"] > 0
