"""Time a named subset of corpus queries with bench.py's exact methodology
(same warmup, same builder().count() timed region, best-of-2 with the
blocking unpersist between runs) — the focused re-measure loop for an
optimization round without paying the full 204-query serial bench.

Usage: python tools/time_queries.py QUERY [QUERY ...] [--explain-dir DIR]

With --explain-dir, also writes each query's .explain("formatted") output
to DIR/<query>.txt (the plan evidence the optimization round commits).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_process_spark.queries import QUERIES  # noqa: E402
from etl_process_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    explain_dir: Path | None = None
    if "--explain-dir" in args:
        i = args.index("--explain-dir")
        explain_dir = Path(args[i + 1])
        explain_dir.mkdir(parents=True, exist_ok=True)
        del args[i:i + 2]
    names = [a for a in args if a in QUERIES]
    unknown = [a for a in args if a not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_queries")

    from etl_process_spark.queries.registry import tbl as _tbl

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        _tbl(spark, sf_dir, t).count()
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    import gc

    def _unpersist_all() -> None:
        gc.collect()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(True)

    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time:{name}")
        runs = []
        for _ in range(2):
            start = time.perf_counter()
            QUERIES[name].builder(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - start, 3))
            _unpersist_all()
        timings[name] = min(runs)
        print(json.dumps({"query": name, "runs": runs}), flush=True)
        if explain_dir is not None:
            import contextlib
            import io

            df = QUERIES[name].builder(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (explain_dir / f"{name}.txt").write_text(buf.getvalue())
            _unpersist_all()
    print(json.dumps({"total": round(sum(timings.values()), 3),
                      "queries": timings}, separators=(",", ":")))


if __name__ == "__main__":
    main()
