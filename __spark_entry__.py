"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The query corpus itself lives in ``etl_process_spark.queries``; each
entry is one operator family from SURVEY.md §2 (parity) or the
training-data extension surface (dedup / similarity / text / JSON).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_process_spark.queries import QUERIES  # noqa: E402
from etl_process_spark.session import configure_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The fraud-shaped multi-rule report: per-user lag windows feeding three
    rule predicates UNION ALL-ed — the reference's report.py:63-113 shape
    on the events table.
    """
    configure_session(spark)
    return QUERIES["fraud_rules_union"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return spec.builder(spark, sf_dir)

        run.__doc__ = spec.doc
        return run

    return {name: wrap(spec) for name, spec in sorted(QUERIES.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted -> rows-only check."""
    return {name: spec.oracle for name, spec in sorted(QUERIES.items())
            if spec.oracle is not None}
