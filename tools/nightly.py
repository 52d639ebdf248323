"""Nightly batch entrypoint — the scheduling shim for the engine's
daily run (reference surface: ``main.cron:1`` schedules ``main.py`` at
01:17 every night; this is the same contract for the Spark engine).

Schedule with ordinary cron, e.g.::

    17 1 * * * cd /root/repo && python tools/nightly.py \
        --inbox /data/inbox --warehouse /data/warehouse

The run is idempotent (watermark + dedup-key append): re-running after
a crash re-processes nothing. ``--as-of`` pins the injectable clock
(F7) for reproducible reruns and backfills; it defaults to now.

Dimension inputs (cards / accounts / clients / blacklist) come from
parquet snapshots under ``--dims-dir`` (one subdirectory per table) —
in the reference they are read live from the OLTP Postgres
(``cards.py:50-56``); an upstream job or ``sources/readers.py::
read_jdbc_incremental`` materializes them here.
"""

from __future__ import annotations

import argparse
import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--inbox", required=True, help="dated-file inbox dir")
    p.add_argument("--warehouse", required=True, help="table catalog dir")
    p.add_argument(
        "--dims-dir",
        default=None,
        help="parquet dimension snapshots (subdirs: cards, accounts, "
        "clients, blacklist); omit to run with empty dims",
    )
    p.add_argument(
        "--as-of",
        default=None,
        help="pinned clock 'YYYY-MM-DD HH:MM:SS' (default: now)",
    )
    p.add_argument(
        "--no-archive", action="store_true", help="leave inbox files in place"
    )
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    from etl_process_spark.pipeline.runner import run_daily_batch
    from etl_process_spark.session import get_spark

    clock = (
        dt.datetime.fromisoformat(args.as_of)
        if args.as_of
        else dt.datetime.now()
    )
    spark = get_spark("nightly-batch")
    dims = {}
    if args.dims_dir:
        for name in ("cards", "accounts", "clients", "blacklist"):
            path = os.path.join(args.dims_dir, name)
            if os.path.isdir(path):
                dims[name] = spark.read.parquet(path)
    res = run_daily_batch(
        spark,
        inbox_dir=args.inbox,
        warehouse_dir=args.warehouse,
        dims=dims,
        clock=clock,
        archive=not args.no_archive,
    )
    print(res)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
