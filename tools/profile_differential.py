"""Split differential cost per query: Spark build+collect vs DuckDB oracle.

The driver's correctness gate pays BOTH sides per query; knowing which side
dominates a slow query tells us whether to optimize the engine plan or the
oracle SQL. Usage: python tools/profile_differential.py q1 q2 ... [--sf DIR]
(no names = 15 slowest from CORRECTNESS_LOCAL.json).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_process_spark.queries import QUERIES  # noqa: E402
from etl_process_spark.queries.differential import duckdb_connection  # noqa: E402
from etl_process_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    if not args:
        local = json.load(open(Path(__file__).parent.parent / "CORRECTNESS_LOCAL.json"))
        ranked = sorted(
            local["results"].items(), key=lambda kv: -kv[1].get("sec", 0)
        )
        args = [k for k, _ in ranked[:15]]
    spark = get_spark("profile")
    print(f"{'query':40} {'spark_s':>8} {'duck_s':>8}")
    for name in args:
        spec = QUERIES[name]
        t0 = time.time()
        spec.builder(spark, sf_dir).collect()
        t1 = time.time()
        if spec.oracle:
            con = duckdb_connection(sf_dir)
            con.execute(spec.oracle).fetchall()
            con.close()
        t2 = time.time()
        print(f"{name:40} {t1 - t0:8.2f} {t2 - t1:8.2f}", flush=True)


if __name__ == "__main__":
    main()
