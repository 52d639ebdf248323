"""Registry for the differential query corpus."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None):
    """Register a (spark, sf_dir) -> DataFrame builder with its oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (TESTDATA.md: one parquet per table).

    ``events.ts`` is nanosecond-precision parquet, which Spark's vectorized
    reader rejects; it is read as raw nanos (``nanosAsLong``) and truncated
    to microseconds with exact integer arithmetic — the same truncation
    DuckDB applies, so both engines see identical timestamps.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
