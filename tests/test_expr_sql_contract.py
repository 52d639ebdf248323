"""Pin the ``_expr_sql`` repr contract (operators/similarity.py).

``dot(a, b, dim)`` emits its unrolled element_at chain as ONE SQL
string parsed JVM-side — that is what keeps query construction off the
py4j wire (~384 round-trips, ~1.2 s per built expression, the round-8
bench-drift root cause). The helper derives the column's SQL from
``str(Column)``'s repr ("Column<'va'>"); if a future Spark changes that
repr, every call site would silently fall back to the Python-loop
builder — bit-identical results, but the construction cost quietly
returns. These tests turn that silent perf regression into a loud
failure.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_process_spark.operators.similarity import EMBED_DIM, _expr_sql, dot


def test_expr_sql_resolves_call_site_shapes(spark):
    # the two shapes the engine actually uses: a bare column and a
    # dotted (dataframe-alias-qualified) reference
    assert _expr_sql(F.col("va")) == "`va`"
    assert _expr_sql(F.col("a.v")) == "`a`.`v`"
    # non-reference shapes must be rejected (fall back to the loop)
    assert _expr_sql(F.col("va") + F.lit(1)) is None
    assert _expr_sql(F.lit(3)) is None


def test_static_dim_dot_plan_is_unrolled_not_aggregate(spark):
    df = spark.range(2).select(
        F.transform(F.sequence(F.lit(1), F.lit(EMBED_DIM)),
                    lambda i: i.cast("double")).alias("va")
    )
    out = df.select(dot(F.col("va"), F.col("va"), dim=EMBED_DIM).alias("d"))
    plan = str(out._jdf.queryExecution().analyzed())
    assert "aggregate(" not in plan, (
        "static-dim dot() fell back to the interpreted higher-order "
        "aggregate — _expr_sql stopped recognizing the column repr"
    )
    assert plan.count("element_at") >= 2 * EMBED_DIM
    # and the fold really is the same IEEE tree: value equals the
    # dynamic-dim aggregate path bit-for-bit
    unrolled = out.collect()[0]["d"]
    dynamic = df.select(
        dot(F.col("va"), F.col("va")).alias("d")).collect()[0]["d"]
    assert unrolled == dynamic
