"""spark.sql over registered views ≡ the DataFrame-built corpus queries
(same Catalyst plan family, same results)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_process_spark.queries import QUERIES
from etl_process_spark.sql import register_catalog_views, register_testdata_views

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_sql_equals_dataframe_results_and_plan_shape(spark):
    register_testdata_views(spark, SF_DIR)
    sql_df = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    df = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .where(F.col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"),
             F.count("*").alias("count_order"))
    )
    assert _canon(sql_df) == _canon(df)
    # same physical shape: pushed filter + single partial-agg exchange
    from etl_process_spark.plans.audit import exchange_count, pushed_filters

    assert exchange_count(sql_df) == exchange_count(df) == 1
    assert any("l_shipdate" in f for f in pushed_filters(sql_df))


def test_sql_join_matches_corpus_query(spark):
    register_testdata_views(spark, SF_DIR)
    sql_df = spark.sql(QUERIES["customers_without_orders"].oracle)
    df = QUERIES["customers_without_orders"].builder(spark, SF_DIR)
    assert _canon(sql_df) == _canon(df)


def test_catalog_views_expose_managed_tables(spark, tmp_path):
    from etl_process_spark.sources.tables import TableCatalog

    cat = TableCatalog(spark, str(tmp_path / "wh"))
    cat.overwrite("dim", spark.range(5).withColumnRenamed("id", "k"))
    register_catalog_views(spark, cat, ["dim"])
    assert spark.sql("SELECT count(*) AS n FROM dim").first()["n"] == 5
