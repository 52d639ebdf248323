"""Expectations engine: seeded-violation counts, NULL semantics, plan cost.

Every rule kind gets a crafted violation so the counts are asserted
exactly; NULL handling is pinned (NULL violates not_null and failing-
predicate rules, but NOT domain/range rules — that separation is what
lets one column carry both a not_null and a domain rule without double
counting).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from etl_process_spark.pipeline import expectations as ex


def _report(df, rules):
    out = df.sparkSession.createDataFrame(
        ex.check_expectations(df, rules).collect()
    )
    return {r["rule"]: (r["n_violations"], r["n_checked"]) for r in out.collect()}


def test_each_rule_kind_counts_seeded_violations(spark):
    orders = spark.createDataFrame(
        [
            Row(ok=1, ck=10, st="P", amt=50.0, d=dt.datetime(2020, 1, 1)),
            Row(ok=2, ck=None, st="X", amt=-5.0, d=dt.datetime(1990, 1, 1)),
            Row(ok=2, ck=11, st="O", amt=60.0, d=dt.datetime(2021, 1, 1)),
            Row(ok=3, ck=99, st=None, amt=None, d=None),
        ]
    )
    customers = spark.createDataFrame([Row(ck=10), Row(ck=11)])
    rules = [
        ex.not_null("ck"),
        ex.accepted_values("st", "P", "O", "F"),
        ex.in_range("amt", 0, 1000),
        ex.expect_expr("recent", "d >= TIMESTAMP '2000-01-01'"),
        ex.unique("ok"),
        ex.foreign_key("ck", customers, "ck"),
    ]
    rep = _report(orders, rules)
    assert rep["not_null_ck"] == (1, 4)
    # NULL status is not a domain violation (not_null's job), 'X' is.
    assert rep["accepted_values_st"] == (1, 4)
    # NULL amount passes range; -5.0 fails.
    assert rep["in_range_amt"] == (1, 4)
    # NULL date fails the predicate (cannot prove it holds), 1990 fails too.
    assert rep["recent"] == (2, 4)
    # key 2 occurs twice -> both rows count as violating.
    assert rep["unique_ok"] == (2, 4)
    # ck=99 is an orphan; NULL ck rows are excluded from the FK check.
    assert rep["fk_ck"] == (1, 3)


def test_clean_table_reports_zero_everywhere(spark):
    df = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")])
    ref = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=3)])
    rep = _report(
        df,
        [
            ex.not_null("k"),
            ex.accepted_values("v", "a", "b"),
            ex.unique("k"),
            ex.foreign_key("k", ref, "k"),
        ],
    )
    assert all(v == 0 for v, _ in rep.values())
    assert {n for _, n in rep.values()} == {2}


def test_row_rules_fold_into_one_aggregate(spark):
    """N row-level rules must cost one scan: the physical plan for a
    row-rules-only report contains exactly one scan of the input."""
    df = spark.range(100).selectExpr("id", "id % 3 AS m")
    rules = [
        ex.not_null("id"),
        ex.in_range("m", 0, 1),
        ex.expect_expr("small", "id < 90"),
        ex.expect_expr("even", "id % 2 = 0"),
    ]
    report = ex.check_expectations(df, rules)
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1, plan
    rep = {r["rule"]: r["n_violations"] for r in report.collect()}
    assert rep == {"not_null_id": 0, "in_range_m": 33, "small": 10, "even": 50}
