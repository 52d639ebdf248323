"""Incremental aggregate maintenance ≡ full recompute, batch by batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_process_spark.operators.incremental import merge_partials, partial_agg
from etl_process_spark.queries.registry import tbl
from etl_process_spark.sources.tables import TableCatalog

SF_DIR = "/root/testdata/sf0.001"

KEYS = ["l_returnflag", "l_linestatus"]
AGGS = [
    ("count", "l_orderkey", "n_items"),
    ("sum", "qty_dec", "sum_qty"),
    ("min", "l_shipdate", "first_ship"),
    ("max", "l_shipdate", "last_ship"),
]


def _prep(df):
    return df.withColumn("qty_dec", F.col("l_quantity").cast("decimal(12,4)"))


def _canon(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_incremental_summary_equals_full_recompute(spark, tmp_path):
    li = _prep(tbl(spark, SF_DIR, "lineitem"))
    # three "daily" batches split by ship year
    batches = [
        li.filter(F.year("l_shipdate") <= 1996),
        li.filter(F.year("l_shipdate").between(1997, 1998)),
        li.filter(F.year("l_shipdate") >= 1999),
    ]
    cat = TableCatalog(spark, str(tmp_path / "wh"))
    for i, b in enumerate(batches):
        p = partial_agg(b, KEYS, AGGS)
        if not cat.exists("summary"):
            cat.overwrite("summary", p)
        else:
            cat.overwrite("summary", merge_partials(cat.read("summary"), p, KEYS, AGGS))
        # invariant at every step: summary == recompute over data so far
        import functools

        so_far = functools.reduce(lambda a, b2: a.unionByName(b2), batches[: i + 1])
        assert _canon(cat.read("summary")) == _canon(partial_agg(so_far, KEYS, AGGS))

    full = partial_agg(li, KEYS, AGGS)
    assert _canon(cat.read("summary")) == _canon(full)
    assert cat.read("summary").count() > 0
