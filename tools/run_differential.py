"""Run the full DuckDB differential and write CORRECTNESS_LOCAL.json.

The driver's CORRECTNESS_r{N}.json has historically truncated (round 1
stopped at 50 of 110 queries), so this tool records the same evidence
locally for the whole corpus: one entry per registered query with the
row-count / schema / value-hash comparison result at the given scale.

Usage: python tools/run_differential.py [sf_dir] [out_path]
(defaults: sf0.01, CORRECTNESS_LOCAL.json — pass an explicit out_path
when sweeping another scale, e.g. CORRECTNESS_SF01.json for sf0.1)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_process_spark.queries import QUERIES  # noqa: E402
from etl_process_spark.queries.differential import compare  # noqa: E402
from etl_process_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = (
        Path(sys.argv[2]).resolve()
        if len(sys.argv) > 2
        else Path(__file__).resolve().parent.parent / "CORRECTNESS_LOCAL.json"
    )
    spark = get_spark("differential")
    out: dict[str, dict] = {}
    t0 = time.time()
    for name in sorted(QUERIES):
        # bench-equivalent hygiene: drop persisted blocks AND the
        # CacheManager's plan registrations between queries, so no
        # query silently reads a predecessor's cache (plan-identical
        # persisted intermediates, e.g. the CC/LPA edge lists) and
        # blocks don't accumulate across the 204-query session — the
        # r9-documented memory-cascade risk at the 10x tier.
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(True)
        start = time.time()
        try:
            res = compare(spark, sf_dir, QUERIES[name])
        except Exception as e:  # keep going; record the failure
            res = {"name": name, "ok": False, "error": repr(e)[:300]}
        res["sec"] = round(time.time() - start, 2)
        out[name] = res
        status = "ok" if res.get("ok") else "FAIL"
        print(f"{status:4} {res['sec']:6.2f}s {name}", flush=True)
    n_ok = sum(1 for r in out.values() if r.get("ok"))
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(out),
        "n_ok": n_ok,
        "total_sec": round(time.time() - t0, 1),
        "results": out,
    }
    out_path.write_text(json.dumps(summary, indent=1) + "\n")
    print(f"{n_ok}/{len(out)} ok -> {out_path}")


if __name__ == "__main__":
    main()
