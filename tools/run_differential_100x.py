"""Correctness at the 100x replica for the two ~linear-growth queries.

BENCH_SCALE.json's big tier times ``part_bfs_reach`` (lineitem 60M
rows) and ``image_phash_dup_pairs`` (documents 5M -> 5M real PNGs) at
the 100x replica and shows their exponents flattening (0.79 / 0.48).
This tool adds the matching CORRECTNESS statement: the same DuckDB
differential that pins them at sf0.01/sf0.1/10x, re-run on the 100x
corpus — frontier BFS against the path-enumeration oracle
(AS MATERIALIZED keeps DuckDB from inlining the edge CTE per hop), and
the pHash LSH matcher against the full per-frame DCT oracle.

The big corpus replicates only the tables these queries read
(documents, lineitem, part — tools/bench_scale.py::build_big_corpus);
``duckdb_connection`` skips the absent tables.

Usage: python tools/run_differential_100x.py [out_path]
Writes CORRECTNESS_100X.json. Run SERIALLY; the DuckDB side is given
a spill directory and most of the box's memory — expect the image
oracle to be the long pole (it rebuilds every pixel of 5M PNGs in SQL).
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
from tools.bench_scale import BIG_DIR, build_big_corpus  # noqa: E402

FAMILY = ["part_bfs_reach", "image_phash_dup_pairs"]

DUCKDB_PRAGMAS = [
    # 48GB, not "most of the box": the oracle shares the machine with a
    # ~48g Spark JVM, and an 80GB cap got the python process
    # kernel-OOM-killed at 77GB RSS mid-oracle. The spill directory
    # keeps the per-frame DCT rebuild out-of-core at 48GB.
    "SET memory_limit='48GB'",
    "SET temp_directory='/tmp/duckdb_spill_100x'",
]


def main() -> None:
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = (
        Path(positional[0]).resolve()
        if positional
        else Path(__file__).resolve().parent.parent / "CORRECTNESS_100X.json"
    )
    resume = "--resume" in sys.argv
    spark = get_spark("differential_100x")
    counts = build_big_corpus(spark, BIG_DIR, 100)
    out: dict[str, dict] = {}
    if resume and out_path.exists():
        prior = json.loads(out_path.read_text())["results"]
        out = {k: v for k, v in prior.items()
               if k in FAMILY and v.get("ok")}
        print(f"resume: {len(out)} green kept", flush=True)
    t0 = time.time()

    def write_summary() -> dict:
        summary = {
            "sf_dir": BIG_DIR,
            "replicas": 100,
            "table_rows": {t: counts[t] for t in ("documents", "lineitem")},
            "n_queries": len(FAMILY),
            "n_ok": sum(1 for q in FAMILY if out.get(q, {}).get("ok")),
            "total_sec": round(time.time() - t0, 1),
            "results": out,
        }
        out_path.write_text(json.dumps(summary, indent=1) + "\n")
        return summary

    for name in FAMILY:
        if out.get(name, {}).get("ok"):
            continue
        start = time.time()
        try:
            res = compare(spark, BIG_DIR, QUERIES[name],
                          duckdb_pragmas=DUCKDB_PRAGMAS)
        except Exception as exc:  # noqa: BLE001 — artifact records the failure
            res = {"name": name, "ok": False,
                   "error": f"{type(exc).__name__}: {exc}"[:500]}
        res["sec"] = round(time.time() - start, 1)
        out[name] = res
        print(f"{name}: ok={res.get('ok')} rows={res.get('rows_spark')} "
              f"{res['sec']}s", flush=True)
        # write-through: a kernel OOM on the second oracle must not
        # lose the first query's completed result (it did once)
        write_summary()
    summary = write_summary()
    print(f"wrote {out_path}: {summary['n_ok']}/{summary['n_queries']} ok")


if __name__ == "__main__":
    main()
