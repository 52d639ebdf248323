"""Run one corpus query (and optionally its DuckDB oracle) by name.

The single-query loupe for debugging and review: prints the result
sample, row count, and — with --oracle — the side-by-side differential
verdict; with --explain, the formatted physical plan.

Usage:
  python tools/run_query.py NAME [sf_dir] [--oracle] [--explain]
  python tools/run_query.py --list
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_process_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    if "--list" in flags or not args:
        for name in sorted(QUERIES):
            print(name)
        return
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    if name not in QUERIES:
        sys.exit(f"unknown query {name!r}; try --list")

    from etl_process_spark.session import get_spark

    spark = get_spark("run_query")
    spec = QUERIES[name]
    df = spec.builder(spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
    df.show(20, truncate=False)
    print(f"{name}: {df.count()} rows at {sf_dir}")
    if "--oracle" in flags:
        from etl_process_spark.queries.differential import compare

        print(compare(spark, sf_dir, spec))


if __name__ == "__main__":
    main()
