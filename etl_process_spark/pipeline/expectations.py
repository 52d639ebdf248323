"""Declarative data-quality expectations (dbt-test / Deequ-style).

The reference has no data-quality layer at all — its only guard is the
row-count print + skip-empty check (``py_scripts/transaction.py:62``,
``cards.py:71``). A warehouse engine needs first-class constraint checks:
this module evaluates a declared rule set against a table and returns a
small violations report, planned so the check cost does not scale with the
number of rules:

- every ROW-LEVEL rule (not_null / accepted_values / in_range / arbitrary
  SQL predicate) compiles to one conditional counter inside a SINGLE global
  aggregate — one table scan total, no shuffle (partials reduce to one row);
- ``unique`` needs the one unavoidable key shuffle (groupBy the key), and
  counts every row whose key occurs more than once;
- ``foreign_key`` is a left-anti join against the referenced key column —
  broadcast when the referenced side is a dimension, so usually zero extra
  shuffles.

The report is rule-per-row ``(rule, kind, n_violations, n_checked)`` —
tiny, unionable across tables, and cheap to alert on.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` selects the evaluation strategy."""

    name: str
    kind: str  # not_null | accepted_values | in_range | expr | unique | foreign_key
    column: str | None = None
    values: tuple = ()
    lo: object = None
    hi: object = None
    expr: str | None = None
    key: tuple[str, ...] = ()
    ref: DataFrame | None = field(default=None, compare=False)
    ref_key: tuple[str, ...] = ()


def not_null(column: str) -> Rule:
    return Rule(name=f"not_null_{column}", kind="not_null", column=column)


def accepted_values(column: str, *values) -> Rule:
    return Rule(
        name=f"accepted_values_{column}", kind="accepted_values",
        column=column, values=tuple(values),
    )


def in_range(column: str, lo, hi) -> Rule:
    return Rule(name=f"in_range_{column}", kind="in_range", column=column, lo=lo, hi=hi)


def expect_expr(name: str, sql_predicate: str) -> Rule:
    """Arbitrary SQL predicate that every row must satisfy."""
    return Rule(name=name, kind="expr", expr=sql_predicate)


def unique(*key: str) -> Rule:
    return Rule(name="unique_" + "_".join(key), kind="unique", key=tuple(key))


def foreign_key(key: str, ref: DataFrame, ref_key: str) -> Rule:
    return Rule(
        name=f"fk_{key}", kind="foreign_key",
        key=(key,), ref=ref, ref_key=(ref_key,),
    )


def _violation_cond(rule: Rule) -> F.Column:
    if rule.kind == "not_null":
        return F.col(rule.column).isNull()
    if rule.kind == "accepted_values":
        # NULL is not a domain violation — that's not_null's job; a NULL
        # isin(...) evaluates to NULL, which must not count as violating.
        return ~F.coalesce(F.col(rule.column).isin(*rule.values), F.lit(True))
    if rule.kind == "in_range":
        inside = F.col(rule.column).between(F.lit(rule.lo), F.lit(rule.hi))
        return ~F.coalesce(inside, F.lit(True))
    if rule.kind == "expr":
        return ~F.coalesce(F.expr(rule.expr), F.lit(False))
    raise ValueError(f"not a row-level rule: {rule.kind}")


def check_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; return the violations report.

    Output schema: ``rule string, kind string, n_violations long,
    n_checked long`` — one row per rule, deterministic content (no
    ordering guarantee; sort at the edge if needed).
    """
    row_rules = [r for r in rules if r.kind in
                 ("not_null", "accepted_values", "in_range", "expr")]
    reports: list[DataFrame] = []

    if row_rules:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, r in enumerate(row_rules):
            aggs.append(
                F.sum(F.when(_violation_cond(r), 1).otherwise(0)).alias(f"__v{i}")
            )
        counted = df.agg(*aggs)
        # Unpivot the one-row aggregate with stack() instead of unioning
        # per-rule projections of it — a union would give each branch its
        # own copy of the aggregate subtree (N scans of the input until
        # exchange reuse maybe rescues it at runtime); stack keeps the
        # plan structurally single-scan for any number of row rules.
        cells = ", ".join(
            f"'{r.name}', '{r.kind}', __v{i}" for i, r in enumerate(row_rules)
        )
        reports.append(
            counted.select(
                F.expr(
                    f"stack({len(row_rules)}, {cells}) AS (rule, kind, n_violations)"
                ),
                F.col("__n").alias("n_checked"),
            ).select(
                "rule", "kind",
                F.col("n_violations").cast("long").alias("n_violations"),
                F.col("n_checked").cast("long").alias("n_checked"),
            )
        )

    for r in rules:
        if r.kind == "unique":
            dup_rows = (
                df.groupBy(*r.key)
                .agg(F.count(F.lit(1)).alias("__c"))
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("__c") > 1, F.col("__c"))), F.lit(0)
                    ).cast("long").alias("n_violations"),
                    F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_checked"),
                )
            )
            reports.append(dup_rows.select(
                F.lit(r.name).alias("rule"), F.lit(r.kind).alias("kind"),
                "n_violations", "n_checked",
            ))
        elif r.kind == "foreign_key":
            child_key = r.key[0]
            ref_keys = r.ref.select(
                F.col(r.ref_key[0]).alias(child_key)
            ).dropDuplicates()
            orphans = (
                df.filter(F.col(child_key).isNotNull())
                .join(F.broadcast(ref_keys), on=child_key, how="left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            )
            total = df.filter(F.col(child_key).isNotNull()).agg(
                F.count(F.lit(1)).cast("long").alias("n_checked")
            )
            reports.append(orphans.crossJoin(total).select(
                F.lit(r.name).alias("rule"), F.lit(r.kind).alias("kind"),
                "n_violations", "n_checked",
            ))

    if not reports:
        raise ValueError("no rules given")
    return reduce(DataFrame.unionByName, reports)
