"""Per-query cost breakdown for the optimization round (guide §1).

For each named query (default: the slowest from BENCH.json) this reports,
at $SPARK_GRAFT_SF_DIR:

* build_s   — Python-side DataFrame construction (plan assembly),
* exec_s    — first noop-sink execution (includes codegen/JIT for the
              query's unique operators),
* exec2_s   — second noop-sink execution (steady state),
* jobs      — Spark jobs launched by the second execution,
* stages    — stages launched by the second execution.

The job/stage counts are the sf0.1 cost model: with kilobyte-scale
shuffles, wall-clock is dominated by per-job and per-stage fixed costs
(driver round-trips, scheduling, checkpoint materialization), so an
iterative query's time is ~linear in its job count. Usage:

    python tools/profile_bench.py [query ...]
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [a for a in sys.argv[1:] if a in QUERIES]
    if not names:
        bench = json.loads(
            (Path(__file__).resolve().parent.parent / "BENCH.json").read_text()
        )["queries"]
        names = [n for n, _ in sorted(bench.items(), key=lambda kv: -kv[1])[:25]]
    spark = get_spark("profile_bench")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warmup: scans + codegen + python worker pool (mirrors bench.py)
    from etl_process_spark.queries.registry import tbl

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        tbl(spark, sf_dir, t).count()
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    import gc

    def unpersist_all() -> None:
        gc.collect()
        for jrdd in sc._jsc.getPersistentRDDs().values():
            jrdd.unpersist(True)

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    rows = []
    for name in names:
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = QUERIES[name].builder(spark, sf_dir)
        t1 = time.perf_counter()
        noop(df)
        t2 = time.perf_counter()
        unpersist_all()
        jobs0 = set(tracker.getJobIdsForGroup(None))
        df = QUERIES[name].builder(spark, sf_dir)
        t3 = time.perf_counter()
        noop(df)
        t4 = time.perf_counter()
        jobs1 = set(tracker.getJobIdsForGroup(None))
        new_jobs = sorted(jobs1 - jobs0)
        stages = 0
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info is not None:
                stages += len(info.stageIds)
        unpersist_all()
        rows.append({
            "query": name,
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "build2_s": round(t3 - t2, 3),
            "exec2_s": round(t4 - t3, 3),
            "jobs": len(new_jobs),
            "stages": stages,
        })
        print(json.dumps(rows[-1], separators=(",", ":")), flush=True)
    out = Path("/tmp/profile_bench.json")
    out.write_text(json.dumps(rows, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
