"""Heavy-basket fan-out bound for the co-purchase edge generation
(`queries/analytics.py::copurchase_pairs`).

The in-array pair explosion is quadratic in BASKET size; one 10k-item
order would emit 10⁸ pairs from a single row. The cap truncates each
basket to its `cap` smallest partkeys (deterministic, documented
sampling) so per-order fan-out is bounded by cap·(cap−1)/2 oriented
pairs — and it must NOT bind on TPC-H-sized baskets, keeping the graph
queries hash-equal to their full-basket oracles.
"""

from pyspark.sql import functions as F

from etl_process_spark.queries.analytics import copurchase_pairs


def _li(spark, orders):
    rows = [
        (ok, pk) for ok, parts in orders.items() for pk in parts
    ]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_cap_bounds_heavy_basket(spark):
    li = _li(spark, {1: list(range(100, 160))})  # one 60-part basket
    got = copurchase_pairs(li, cap=5, oriented=True).collect()
    # exactly the 5 smallest partkeys pair up: C(5,2) oriented pairs
    assert len(got) == 10
    used = {r.u for r in got} | {r.v for r in got}
    assert used == {100, 101, 102, 103, 104}
    assert all(r.u < r.v for r in got)


def test_cap_never_binds_on_small_baskets(spark):
    orders = {1: [7, 3, 9], 2: [3, 5], 3: [8]}
    li = _li(spark, orders)
    capped = sorted(
        map(tuple, copurchase_pairs(li, cap=256, oriented=True).collect())
    )
    expected = sorted(
        (min(a, b), max(a, b))
        for parts in orders.values()
        for a in parts
        for b in parts
        if a < b
    )
    assert capped == expected


def test_symmetric_matches_old_dual_explode_multiset(spark):
    """oriented=False must reproduce the exact multiset the old
    array_remove dual explode emitted (weight-sensitive consumers like
    pagerank depend on multiplicity across orders)."""
    orders = {1: [1, 2, 3], 2: [2, 3], 3: [1, 2, 3, 4]}
    li = _li(spark, orders)
    got = sorted(map(tuple, copurchase_pairs(li, oriented=False).collect()))
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    old = sorted(
        map(
            tuple,
            per_order.select(F.explode("ps").alias("u"), "ps")
            .select(
                "u", F.explode(F.array_remove("ps", F.col("u"))).alias("v")
            )
            .collect(),
        )
    )
    assert got == old
