"""spark.sql over registered views ≡ the DataFrame-built corpus queries
(same Catalyst plan family, same results)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_process_spark.queries import QUERIES
from etl_process_spark.sql import register_catalog_views, register_testdata_views
import pytest

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


# Oracles that are plain ANSI (no DuckDB list comprehensions /
# string_split_regex / time_bucket) — each runs UNMODIFIED on spark.sql
# and produces string-identical results to the DataFrame builder. Two
# more (daily_quality_drift, funnel_conversion, ivm_join_delta) agree numerically but
# render DECIMAL vs DOUBLE scales differently; the rest of the corpus
# uses DuckDB-dialect constructs by design (the oracle is a DIFFERENT
# engine on purpose).
PORTABLE_ORACLES = [
    "approx_distinct_users", "bi_nation_trade_volume",
    "brand_size_disjunction", "brandwise_supplier_counts",
    "copurchase_communities", "copurchase_triangles", "cube_order_counts",
    "cumulative_revenue_per_customer", "customer_order_distribution",
    "customers_outside_regions", "customers_without_orders",
    "daily_from_hourly_rollup", "debounced_events", "discount_revenue_forecast",
    "distinct_users_per_type", "event_transition_probs", "events_asof_join",
    "events_asof_join_merge", "gdpr_forget_rollup",
    "filtered_projection", "fresh_part_shippers", "global_shuffle_ordinals",
    "grouping_sets_mix",
    "heavy_hitter_order_groups", "hourly_rollup", "large_quantity_orders",
    "last_touch_attribution", "latest_event_per_user",
    "nation_balance_nullsafe", "nation_metrics_unpivot",
    "nation_presence_full_outer", "nation_revenue_share",
    "nation_revenue_trend", "nation_year_profit", "open_orders_over_time",
    "order_price_histogram", "order_price_ntile",
    "order_price_rank_features", "order_priority_pivot",
    "order_priority_semi_counts", "order_region_denorm",
    "orders_quality_report", "orders_table_profile",
    "overlapping_click_view_pairs", "pareto_frontier_orders",
    # part_bfs_reach left this list in round 7: its oracle now pins the
    # edge/frontier CTEs AS MATERIALIZED (DuckDB dialect — inlining
    # recomputes the 6M-row self-join per hop level and exhausts spill
    # disk at the 10x replica), which spark.sql does not parse
    "parts_above_type_avg", "parts_never_returned_except",
    "peak_revenue_suppliers", "price_band_running_sum",
    "price_equidepth_histogram", "price_moments_exact", "pricing_summary",
    "priority_customers_intersect", "priority_linecount_by_flag",
    "promo_revenue_share", "region_return_share", "regional_local_volume",
    "returned_surplus_parts_exceptall", "rollup_revenue",
    "salted_hot_key_agg", "salted_hot_key_join", "scd2_asof_snapshot",
    "scd2_versions_from_events", "shipping_priority_topk",
    "similar_part_names", "snapshot_diff_changes", "source_domain_caps",
    "sole_failing_supplier_per_order", "suppliers_with_shipments",
    "top_balance_suppliers_per_region", "top_returned_customers",
    "top_revenue_orders", "topk_orders_per_customer",
    "trailing_week_user_value", "untapped_customers", "value_mad_outliers",
    "watermark_incremental", "weekly_distinct_rollup_hll",
]


@pytest.mark.slow  # corpus-sweep/long-property tier (see pytest.ini)
def test_portable_oracles_run_unmodified_on_spark_sql(spark):
    """76 of the corpus' DuckDB oracle strings are plain ANSI: a SQL
    user pastes them into spark.sql and gets string-identical results
    to the engine's DataFrame path — the strongest form of the
    'reference users keep their SQL habit' claim."""
    register_testdata_views(spark, SF_DIR)
    failures = []
    for name in PORTABLE_ORACLES:
        spec = QUERIES[name]
        try:
            if _canon(spark.sql(spec.oracle)) != _canon(
                spec.builder(spark, SF_DIR)
            ):
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {e}")
    assert not failures, failures
