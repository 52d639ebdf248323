"""Classic decision-support query shapes (TPC-H Q2/Q7/Q11/Q15/Q18/Q19/Q20/Q22
analogs) reshaped onto the testdata schema.

The reference has exactly one analytic query (the fraud report,
``py_scripts/report.py:12-113``); these widen the engine's analytic surface
with the remaining canonical decision-support shapes the corpus did not yet
cover: correlated-max join-back (Q2), join+agg top-k (Q3), EXISTS priority
counts (Q4), local-supplier nation correlation (Q5), the pure
scan-aggregate (Q6), bi-directional join-pair filters (Q7), multi-way profit
expression agg (Q9), returned-item top-k (Q10), HAVING-against-global-scalar
(Q11), conditional-share single-pass agg (Q14), agg-reused-as-its-own-max
(Q15), distinct-count with excluded set (Q16), IN-aggregated-subquery (Q18),
disjunctive OR-of-ANDs pushdown (Q19), nested IN subqueries (Q20), and
scalar-avg threshold + anti join (Q22).

Scale notes are per-query; the common rules: dims (nation/region) broadcast,
aggregates combine map-side before their one key shuffle, and money math is
exact DECIMAL so results are bit-identical across engines and re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_process_spark.queries.registry import query, tbl


def _disc_price() -> F.Column:
    """Exact-decimal extended price after discount (same idiom as the
    pricing_summary query and its oracle — keeps engine/oracle sums
    bit-identical)."""
    price = F.col("l_extendedprice").cast("decimal(12,4)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    return price * (F.lit(1) - disc)


@query(
    "top_balance_suppliers_per_region",
    """
    SELECT r_name, s_name, CAST(s_acctbal AS DOUBLE) AS acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE s_acctbal = (
      SELECT max(s2.s_acctbal)
      FROM supplier s2 JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      WHERE n2.n_regionkey = n.n_regionkey)
    """,
)
def top_balance_suppliers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: rows equal to a correlated per-group max, ties kept.

    The correlated scalar subquery decorrelates to a per-region max
    aggregate joined back on (regionkey, acctbal). The per-region max table
    has one row per region — always broadcastable, so the join-back adds no
    shuffle beyond the aggregate's own; at 100 TB supplier the plan is one
    supplier shuffle + one broadcast. Unlike arg_max/row_number top-1
    (priciest_order_per_customer), equality join-back preserves ties.
    """
    supp = tbl(spark, sf_dir, "supplier")
    nat = tbl(spark, sf_dir, "nation")
    reg = tbl(spark, sf_dir, "region")
    s_located = supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey).join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    )
    region_max = (
        s_located.groupBy("n_regionkey")
        .agg(F.max("s_acctbal").alias("max_bal"))
        .withColumnRenamed("n_regionkey", "mr_regionkey")
    )
    return (
        s_located.join(
            F.broadcast(region_max),
            (F.col("n_regionkey") == F.col("mr_regionkey"))
            & (F.col("s_acctbal") == F.col("max_bal")),
        )
        .select("r_name", "s_name", F.col("s_acctbal").cast("double").alias("acctbal"))
    )


@query(
    "bi_nation_trade_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(12,4))
               * (1 - CAST(l_discount AS DECIMAL(6,4)))) * 100) AS BIGINT)
             AS volume_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def bi_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between two nations, either direction.

    Join order is chosen so the ONE unavoidable big shuffle
    (lineitem↔orders on orderkey) moves only pre-filtered rows: the
    nation-name filter lands on supplier and customer through broadcast
    joins (2 of 25 nations survive), the filtered customer side broadcasts
    into orders, and the filtered supplier side broadcasts into lineitem —
    so both shuffle inputs are ~8% of their tables before any network
    redistribution. (Left to CBO-less Catalyst, the literal SQL join order
    shuffles the FULL lineitem and orders first — ~12× more shuffle
    bytes.) The OR pair filter stays as a residual to drop same-nation
    combos.
    """
    li = tbl(spark, sf_dir, "lineitem")
    od = tbl(spark, sf_dir, "orders")
    cust = tbl(spark, sf_dir, "customer")
    supp = tbl(spark, sf_dir, "supplier")
    nat = tbl(spark, sf_dir, "nation")
    pair = ("NATION_3", "NATION_7")
    n1 = nat.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp_n1 = supp.join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key")).select(
        "s_suppkey", "supp_nation"
    )
    cust_n2 = cust.join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key")).select(
        "c_custkey", "cust_nation"
    )
    od_tagged = od.join(F.broadcast(cust_n2), od.o_custkey == F.col("c_custkey")).select(
        "o_orderkey", "cust_nation"
    )
    li_tagged = li.join(F.broadcast(supp_n1), li.l_suppkey == F.col("s_suppkey"))
    return (
        li_tagged.join(od_tagged, li_tagged.l_orderkey == od_tagged.o_orderkey)
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(F.floor(F.sum(_disc_price()) * 100).cast("bigint").alias("volume_cents"))
    )


@query(
    "nation_revenue_share",
    """
    WITH rev AS (
      SELECT n_name,
             sum(CAST(l_extendedprice AS DECIMAL(12,4))
                 * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS nation_rev
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name)
    SELECT n_name, CAST(floor(nation_rev * 100) AS BIGINT) AS nation_rev_cents
    FROM rev
    WHERE nation_rev * 25 > (SELECT sum(nation_rev) FROM rev)
    """,
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: groups whose total exceeds a fraction of the global total.

    The global scalar is an aggregate OVER the already per-nation
    aggregated frame (25 rows), not a second pass over lineitem — then a
    broadcast nested-loop join of one row. Comparing ``rev * 25 > total``
    in exact decimals avoids a division and stays engine-portable (no
    float threshold to disagree on the boundary).
    """
    li = tbl(spark, sf_dir, "lineitem")
    supp = tbl(spark, sf_dir, "supplier")
    nat = tbl(spark, sf_dir, "nation")
    rev = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).alias("rev_dec"))
    )
    total = rev.agg(F.sum("rev_dec").alias("total_dec"))
    return (
        rev.crossJoin(F.broadcast(total))
        .filter(F.col("rev_dec") * 25 > F.col("total_dec"))
        .select("n_name", F.floor(F.col("rev_dec") * 100).cast("bigint").alias("nation_rev_cents"))
    )


@query(
    "peak_revenue_suppliers",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(12,4))
                 * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           CAST(floor(total_rev * 100) AS BIGINT) AS total_rev_cents
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def peak_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: an aggregate view compared against its own max.

    The per-supplier revenue aggregate feeds both the join and the scalar
    max; Spark's exchange-reuse recognizes the identical subplan, so the
    shuffle over lineitem happens once (ReusedExchange in the physical
    plan — asserted by test_plans). The max is one broadcast row; the
    date filter prunes at the parquet scan. Exact-decimal equality keeps
    the `= max` boundary deterministic.
    """
    li = tbl(spark, sf_dir, "lineitem")
    supp = tbl(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
            # The inner-join branch infers isnotnull(l_suppkey) and pushes it
            # below the partial aggregate; stating it on BOTH consumers keeps
            # the two aggregate subplans canonically identical, which is what
            # lets AQE plan the second consumer as a ReusedExchange (one
            # lineitem shuffle, not two).
            & F.col("l_suppkey").isNotNull()
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).alias("rev_dec"))
    )
    peak = rev.agg(F.max("rev_dec").alias("max_rev"))
    return (
        supp.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(peak), F.col("rev_dec") == F.col("max_rev"))
        .select("s_suppkey", "s_name",
                F.floor(F.col("rev_dec") * 100).cast("bigint").alias("total_rev_cents"))
    )


@query(
    "large_quantity_orders",
    """
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    SELECT c_name, o_orderkey, o_orderdate, CAST(qty AS DOUBLE) AS total_qty
    FROM big JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
    """,
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose summed quantity clears a threshold.

    The IN-aggregated-subquery decorrelates to aggregate-then-join: the
    HAVING filter runs on the aggregate's output (a tiny fraction of
    orders), and that filtered frame drives the joins — so orders and
    customer are probed with a small build side. At 100 TB the lineitem
    groupBy is the only full shuffle; everything after it touches only
    qualifying orderkeys.
    """
    li = tbl(spark, sf_dir, "lineitem")
    od = tbl(spark, sf_dir, "orders")
    cust = tbl(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
    )
    return (
        od.join(F.broadcast(big), od.o_orderkey == big.l_orderkey)
        .join(cust, od.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", F.col("qty").cast("double").alias("total_qty"))
    )


@query(
    "brand_size_disjunction",
    """
    SELECT CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(12,4))
               * (1 - CAST(l_discount AS DECIMAL(6,4)))) * 100) AS BIGINT)
             AS revenue_cents,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 40)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
)
def brand_size_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs predicate spanning both join sides.

    Catalyst's CNF conversion extracts the single-table residue of the
    disjunction and pushes it through the join: the part scan receives the
    brand/size OR, the lineitem scan the quantity-range OR (visible as
    PushedFilters on both scans), while the full cross-side disjunction
    stays as the post-join residual. The filtered part side then
    broadcasts. Without CNF pushdown this shape reads both tables in full.
    """
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    joined = li.join(part, part.p_partkey == li.l_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return joined.filter(cond).agg(
        F.floor(F.sum(_disc_price()) * 100).cast("bigint").alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "fresh_part_shippers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY l_suppkey, l_partkey HAVING sum(l_quantity) > 100)
    """,
)
def fresh_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested IN subqueries → semi-join pipeline.

    Inner IN becomes a broadcast semi join of lineitem against the
    name-filtered part keys (filter evaluated before broadcast, so the
    build side is the small matching subset); the aggregated outer IN
    becomes a left-semi join of supplier against the qualifying suppkeys.
    One key shuffle (the (supp, part) groupBy); no distinct needed —
    left_semi deduplicates by construction.
    """
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    supp = tbl(spark, sf_dir, "supplier")
    red_parts = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    qualifying = (
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return supp.join(
        qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "untapped_customers",
    """
    WITH pool AS (
      SELECT * FROM customer
      WHERE c_mktsegment IN ('BUILDING','MACHINERY','AUTOMOBILE') AND c_acctbal > 0),
      thr AS (SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) AS total, count(*) AS n FROM pool)
    SELECT c_mktsegment, count(*) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) * 100 AS BIGINT) AS total_bal_cents
    FROM pool, thr
    WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n > total
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
)
def untapped_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average balances with no recent activity.

    The ``bal > avg(bal)`` threshold is computed as ``bal * n > total`` in
    exact decimals — multiplying by the count instead of dividing keeps the
    comparison exact in every engine (a float average would make boundary
    rows engine-dependent). The NOT EXISTS is a left-anti join against
    orders pre-filtered on the date (pushed to the scan); the scalar
    (total, n) row broadcasts.
    """
    cust = tbl(spark, sf_dir, "customer")
    od = tbl(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    pool = cust.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE")
        & (F.col("c_acctbal") > 0)
    )
    thr = pool.agg(F.sum(bal).alias("total"), F.count(F.lit(1)).alias("n"))
    recent = od.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        pool.crossJoin(F.broadcast(thr))
        .filter(bal * F.col("n") > F.col("total"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            (F.sum(bal) * 100).cast("bigint").alias("total_bal_cents"),
        )
    )


@query(
    "priority_linecount_by_flag",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def priority_linecount_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional CASE-sums pivoting a category inside one agg.

    Both CASE branches ride the same single-shuffle aggregate (map-side
    partial sums of 0/1 ints), so adding more conditional counters is free
    at any scale. The shipdate range prunes at the lineitem scan before
    the join.
    """
    li = tbl(spark, sf_dir, "lineitem")
    od = tbl(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "customers_outside_regions",
    """
    SELECT c_mktsegment, count(*) AS n_cust
    FROM customer
    WHERE c_nationkey NOT IN (
      SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name IN ('AFRICA','AMERICA'))
    GROUP BY c_mktsegment
    """,
)
def customers_outside_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery → null-aware anti join (a distinct physical join
    kind: one NULL in the subquery empties the result, so a plain anti
    join is NOT equivalent in general).

    Expressed through the engine's SQL entry point so Catalyst plans its
    single-column NAAJ specialization: a BroadcastHashJoin LeftAnti with
    isNullAware=true (asserted by test_plans) — O(n) probes instead of
    the naive nested-loop the general NOT IN requires. The subquery side
    (25 nations × region filter) is always broadcastable.
    """
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    tbl(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    tbl(spark, sf_dir, "region").createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_cust
        FROM customer
        WHERE c_nationkey NOT IN (
          SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
          WHERE r_name IN ('AFRICA','AMERICA'))
        GROUP BY c_mktsegment
        """
    )


@query(
    "order_priority_semi_counts",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def order_priority_semi_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: count orders per priority that have at least one
    qualifying line (EXISTS → left-semi join).

    The semi join probes orders with lineitem's qualifying orderkeys and
    emits each order at most once — no distinct pass needed. Both sides
    are pre-filtered at their scans (date range on orders, returnflag on
    lineitem, both visible as PushedFilters), so the one orderkey shuffle
    moves only the ~1/8 of orders in the quarter and the 'R' subset of
    lines. The 5-row priority aggregate after it is map-combined.
    """
    od = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    window = od.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        window.join(returned, window.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "discount_revenue_forecast",
    """
    SELECT CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(12,4))
               * CAST(l_discount AS DECIMAL(6,4))) * 100) AS BIGINT)
             AS revenue_cents,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def discount_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: the canonical selective scan-aggregate (no join at all).

    Everything before the single global aggregate happens inside the
    parquet scan: all three predicates push down as PushedFilters (and
    prune row groups via column stats), and only 3 of 11 columns are
    read. At 100 TB this query is pure scan bandwidth — the plan has no
    exchange except the final 1-row partial-agg gather, which is the
    optimum for any engine. Money math in exact decimals, cast to double
    only at the edge.
    """
    li = tbl(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,4)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.floor(F.sum(price * disc) * 100).cast("bigint").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "nation_year_profit",
    """
    SELECT n_name, CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                          * (1 - CAST(l_discount AS DECIMAL(6,4)))
                        - CAST(p_retailprice AS DECIMAL(12,4))
                          * CAST(l_quantity AS DECIMAL(12,4))) * 100) AS BIGINT)
             AS profit_cents
    FROM lineitem JOIN part ON p_partkey = l_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%green%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit (revenue minus cost) per supplier nation per year.

    The testdata has no partsupp table, so retail price × quantity stands
    in for supply cost — the shape (5-way join, expression aggregate,
    two-key groupBy) is what matters. Join order: the p_name LIKE filter
    survives on a small part subset that BROADCASTS into lineitem first,
    shrinking the fact before the one big orderkey shuffle; supplier and
    nation broadcast too, so lineitem↔orders is the only exchange of
    consequence. The LIKE '%green%' is a contains filter — pushed to the
    part scan (StringContains), not evaluable from stats, but part is the
    small side anyway.
    """
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    supp = tbl(spark, sf_dir, "supplier")
    od = tbl(spark, sf_dir, "orders")
    nat = tbl(spark, sf_dir, "nation")
    green = part.filter(F.col("p_name").like("%green%")).select(
        "p_partkey", "p_retailprice"
    )
    cost = F.col("p_retailprice").cast("decimal(12,4)") * F.col("l_quantity").cast(
        "decimal(12,4)"
    )
    return (
        li.join(F.broadcast(green), li.l_partkey == green.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(F.floor(F.sum(_disc_price() - cost) * 100).cast("bigint").alias("profit_cents"))
    )


@query(
    "top_returned_customers",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(12,4))
               * (1 - CAST(l_discount AS DECIMAL(6,4)))) * 100) AS BIGINT)
             AS revenue_cents
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY sum(CAST(l_extendedprice AS DECIMAL(12,4))
               * (1 - CAST(l_discount AS DECIMAL(6,4)))) DESC, c_custkey
    LIMIT 20
    """,
)
def top_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-k customers by revenue lost to returned items.

    The quarter filter lands on the orders scan and rides the broadcast
    into lineitem (only qualifying orderkeys probe), the returnflag
    filter lands on the lineitem scan, so the custkey aggregate shuffles
    only returned lines from one quarter. Top-20 is ordered on the EXACT
    decimal sum with custkey as a total tie-break (a double sort key
    could disagree with the oracle on the cut line), and plans as
    TakeOrderedAndProject — per-partition heaps, no global sort.
    """
    cust = tbl(spark, sf_dir, "customer")
    od = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    nat = tbl(spark, sf_dir, "nation")
    quarter = od.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    returned = li.filter(F.col("l_returnflag") == "R")
    return (
        returned.join(F.broadcast(quarter), returned.l_orderkey == quarter.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_disc_price()).alias("rev_dec"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .orderBy(F.col("rev_dec").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", "n_name",
            F.floor(F.col("rev_dec") * 100).cast("bigint").alias("revenue_cents"),
        )
    )


@query(
    "promo_revenue_share",
    """
    WITH s AS (
      SELECT sum(CASE WHEN p_type = 'PROMO'
                      THEN CAST(l_extendedprice AS DECIMAL(12,4))
                           * (1 - CAST(l_discount AS DECIMAL(6,4)))
                      ELSE CAST(0 AS DECIMAL(12,4)) END) AS promo_dec,
             sum(CAST(l_extendedprice AS DECIMAL(12,4))
                 * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS total_dec
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01')
    SELECT promo_cents, total_cents,
           CAST((1000000 * promo_cents - (1000000 * promo_cents) % total_cents)
                / total_cents AS BIGINT) AS promo_share_ppm
    FROM (SELECT CAST(floor(promo_dec * 100) AS BIGINT) AS promo_cents,
                 CAST(floor(total_dec * 100) AS BIGINT) AS total_cents
          FROM s)
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional share of revenue from one product class.

    Both the PROMO-only and the total sum ride a single aggregate over
    the month's lines (one CASE, one pass — not two scans), with part
    broadcast into the date-pruned lineitem scan. The share is computed
    double÷double AFTER exact-decimal summation: decimal division
    rounding rules differ across engines, but decimal→double conversion
    and IEEE division are bit-identical everywhere, so the oracle agrees
    to the last bit.
    """
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    month = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
        F.lit(0).cast("decimal(12,4)")
    )
    return (
        month.join(F.broadcast(part), part.p_partkey == month.l_partkey)
        .agg(
            F.sum(promo).alias("promo_dec"),
            F.sum(_disc_price()).alias("total_dec"),
        )
        .select(
            F.floor(F.col("promo_dec") * 100).cast("bigint").alias("promo_cents"),
            F.floor(F.col("total_dec") * 100).cast("bigint").alias("total_cents"),
        )
        .select(
            "promo_cents", "total_cents",
            F.expr("(1000000 * promo_cents) div total_cents").alias(
                "promo_share_ppm"
            ),
        )
    )


@query(
    "brandwise_supplier_counts",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#4' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def brandwise_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part bucket, minus an
    excluded supplier set.

    The testdata has no partsupp, so lineitem's (partkey, suppkey) pairs
    play the association table. The NOT IN exclusion is an anti join
    against the (tiny, filtered, non-null-key) supplier subset —
    broadcast, zero extra shuffles. count(DISTINCT suppkey) expands to
    the standard two-phase plan: partial dedup of (brand,type,size,
    suppkey) map-side, then one shuffle keyed on the group — the
    distinct never concentrates on a single node, so the shape scales
    with group cardinality, not row count.
    """
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    supp = tbl(spark, sf_dir, "supplier")
    buckets = part.filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_suppliers = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(buckets), li.l_partkey == buckets.p_partkey)
        .join(
            F.broadcast(bad_suppliers),
            li.l_suppkey == bad_suppliers.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "shipping_priority_topk",
    """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(12,4))
               * (1 - CAST(l_discount AS DECIMAL(6,4)))) * 100) AS BIGINT)
             AS revenue_cents
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY sum(CAST(l_extendedprice AS DECIMAL(12,4))
               * (1 - CAST(l_discount AS DECIMAL(6,4)))) DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: unshipped-order revenue, top-k on the aggregate.

    The mktsegment filter shrinks customer before it broadcasts into
    orders; the date filters push to both fact scans. The orderkey
    aggregate is the one shuffle, and the top-10 on its output plans as
    TakeOrderedAndProject over the aggregate's partitions (per-partition
    heaps — no global sort even though the sort key is a computed
    aggregate). Ordered on the exact decimal with orderkey tie-break so
    the cut line is engine-independent.
    """
    cust = tbl(spark, sf_dir, "customer")
    od = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    open_orders = (
        od.filter(F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(F.broadcast(building), od.o_custkey == building.c_custkey)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    late_lines = li.filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        late_lines.join(F.broadcast(open_orders),
                        late_lines.l_orderkey == open_orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey", "o_orderdate", "o_orderpriority",
            F.floor(F.col("rev_dec") * 100).cast("bigint").alias("revenue_cents"),
        )
    )


@query(
    "regional_local_volume",
    """
    SELECT n_name, CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(12,4))
               * (1 - CAST(l_discount AS DECIMAL(6,4)))) * 100) AS BIGINT)
             AS revenue_cents
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def regional_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue where customer and supplier share a nation.

    The signature feature is the c_nationkey = s_nationkey correlation
    between two tables that are NOT adjacent in the join chain — it
    can only be applied once both keys are in scope, so the plan carries
    customer's nationkey through the orders broadcast into lineitem and
    evaluates the correlation inside the lineitem↔supplier join
    condition (supplier is broadcast: composite equi-key (suppkey,
    nationkey), still a hash join — no residual filter pass). Region
    restriction prunes nation to the ~1/5 ASIA subset before anything
    joins. One shuffle total (the 5-row nation aggregate's).
    """
    cust = tbl(spark, sf_dir, "customer")
    od = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    supp = tbl(spark, sf_dir, "supplier")
    nat = tbl(spark, sf_dir, "nation")
    reg = tbl(spark, sf_dir, "region")
    asia_nations = nat.join(
        F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
        nat.n_regionkey == reg.r_regionkey,
    ).select("n_nationkey", "n_name")
    asia_cust = cust.join(
        F.broadcast(asia_nations), cust.c_nationkey == asia_nations.n_nationkey
    ).select("c_custkey", "c_nationkey")
    year_orders = (
        od.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(asia_cust), od.o_custkey == asia_cust.c_custkey)
        .select("o_orderkey", "c_nationkey")
    )
    enriched = li.join(
        F.broadcast(year_orders), li.l_orderkey == year_orders.o_orderkey
    )
    local = enriched.join(
        F.broadcast(supp),
        (enriched.l_suppkey == supp.s_suppkey)
        & (enriched.c_nationkey == supp.s_nationkey),
    )
    return (
        local.join(F.broadcast(asia_nations.withColumnRenamed("n_nationkey", "nk")),
                   F.col("s_nationkey") == F.col("nk"))
        .groupBy("n_name")
        .agg(
            F.floor(F.sum(_disc_price()) * 100)
            .cast("bigint").alias("revenue_cents")
        )
    )
