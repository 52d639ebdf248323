"""Dump .explain('formatted') for named queries to files — the plan
evidence an optimization round commits, without the timing runs
tools/time_queries.py adds.

Usage: python tools/dump_explain.py DIR QUERY [QUERY ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_process_spark.queries import QUERIES  # noqa: E402
from etl_process_spark.session import get_spark  # noqa: E402


def main() -> None:
    out = Path(sys.argv[1])
    out.mkdir(parents=True, exist_ok=True)
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_explain")
    for name in names:
        df = QUERIES[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out / f"{name}.txt").write_text(buf.getvalue())
        print("wrote", out / f"{name}.txt", flush=True)


if __name__ == "__main__":
    main()
