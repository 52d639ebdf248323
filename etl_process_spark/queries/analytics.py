"""Multi-dimensional aggregation + set-operation surface.

The reference has no GROUP BY at all (SURVEY §2.4) and only UNION ALL
(§2.7); these queries round out the general analytics surface a user of
the engine expects — rollup / cube / grouping sets (one shuffle each,
grouping-set expansion happens map-side in the Expand operator) and the
set operations INTERSECT / EXCEPT (hash-based set semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_process_spark.queries.registry import query, tbl


@query(
    "rollup_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS grp_id,
           count(*) AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag → flag+status → grand total).

    The Expand operator emits one row per grouping set map-side, then a
    single hash aggregate — the shuffle still carries only partial
    aggregates, so a 100 TB rollup costs one pass + one exchange.
    """
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("grp_id"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,4)")).cast("double").alias("revenue"),
        )
        .select("l_returnflag", "l_linestatus", "grp_id", "n_items", "revenue")
    )


@query(
    "cube_order_counts",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT) AS grp_id,
           count(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in one pass."""
    od = tbl(spark, sf_dir, "orders")
    return (
        od.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("grp_id"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select("o_orderstatus", "o_orderpriority", "grp_id", "n_orders")
    )


@query(
    "grouping_sets_mix",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def grouping_sets_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the engine's SQL entry point (two
    disjoint single-column sets — neither rollup nor cube)."""
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM parquet.`{sf_dir}/orders.parquet`
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "priority_customers_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
)
def priority_customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): customers with both URGENT and HIGH
    orders — plans as a left-semi aggregate join, no row explosion."""
    od = tbl(spark, sf_dir, "orders")
    urgent = od.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = od.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    return urgent.intersect(high)


@query(
    "parts_never_returned_except",
    """
    SELECT l_partkey FROM lineitem
    EXCEPT
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def parts_never_returned_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): parts shipped but never returned — a
    left-anti aggregate join over the same scan."""
    li = tbl(spark, sf_dir, "lineitem")
    shipped = li.select("l_partkey")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    return shipped.subtract(returned)
