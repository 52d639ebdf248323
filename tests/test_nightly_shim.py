"""Scheduling shim smoke test (`tools/nightly.py`) — the cron-invoked
entrypoint (reference parity: ``main.cron:1``). One invocation against
an empty inbox must run the whole daily batch (no files → clean no-op
BatchResult) and exit 0; a second run is idempotent."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_nightly_entrypoint_runs_once(tmp_path, spark):
    import nightly

    inbox = tmp_path / "inbox"
    wh = tmp_path / "wh"
    inbox.mkdir()
    rc = nightly.main(
        [
            "--inbox", str(inbox),
            "--warehouse", str(wh),
            "--as-of", "2024-03-05 01:17:00",
        ]
    )
    assert rc == 0
    # idempotent rerun: still clean
    assert nightly.main(
        [
            "--inbox", str(inbox),
            "--warehouse", str(wh),
            "--as-of", "2024-03-06 01:17:00",
        ]
    ) == 0


def test_nightly_arg_parsing():
    import nightly

    a = nightly.parse_args(
        ["--inbox", "/i", "--warehouse", "/w", "--no-archive"]
    )
    assert a.inbox == "/i" and a.no_archive and a.dims_dir is None
