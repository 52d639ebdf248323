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

    ``events.ts`` is normalized to session-zone ``TIMESTAMP`` whatever the
    file's physical type — driver regenerations have shipped it both as
    nanosecond parquet (which Spark's vectorized reader rejects; read as raw
    nanos via ``nanosAsLong`` and integer-truncated to micros, the same
    truncation DuckDB applies) and as ``timestamp[us]`` (which Spark infers
    as TIMESTAMP_NTZ; cast to TIMESTAMP — an identity on the wall-clock in
    this engine's UTC sessions, matching DuckDB's naive reading). Downstream
    queries always see one stable TimestampType schema.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(ts_type, T.TimestampType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
