"""SQL entry surface: register the warehouse tables as temp views so
users run plain ``spark.sql(...)`` against the engine.

The reference's whole interface is SQL strings over named tables
(psycopg2 f-strings, e.g. ``report.py:12-113``); a user switching to
this engine keeps that habit — Catalyst plans a ``spark.sql`` query and
a DataFrame-built query identically (same optimizer, same physical
strategies, proven by ``tests/test_sql_surface.py``), so everything the
corpus demonstrates about pushdown/broadcast/partial-agg applies
verbatim to SQL-shaped usage.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Create (or replace) one temp view per testdata table, with the
    same normalizations the DataFrame path applies (events.ts type
    pinning in ``queries/registry.py::tbl``)."""
    from etl_process_spark.queries.registry import tbl

    for name in TABLES:
        tbl(spark, sf_dir, name).createOrReplaceTempView(name)


def register_catalog_views(spark: SparkSession, catalog, names) -> None:
    """Expose TableCatalog tables (current versions) as temp views —
    the SQL surface over the engine's own managed storage."""
    for name in names:
        catalog.read(name).createOrReplaceTempView(name)
