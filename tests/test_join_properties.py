"""Property-based differentials for the custom join operators.

Hypothesis generates random timelines and asserts that each scale-path
implementation agrees exactly with its trusted naive twin:

* ``asof_join_merge`` (union-merge) ≡ ``asof_join`` (literal J4 condition)
  over random SCD2 timelines with tombstones and boundary-equal facts;
* ``interval_overlap_join`` (binned equi-join) ≡ cross-filter overlap over
  random intervals, for a bin width the data was not tuned to.

Spark jobs per example are expensive, so examples are few but each carries
many keys/rows — breadth per example, not example count.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_process_spark.operators.asof import asof_join, asof_join_merge
from etl_process_spark.operators.intervals import interval_overlap_join
import pytest

T0 = dt.datetime(2024, 1, 1)
INF = dt.datetime(9999, 12, 31)

HYP = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# per key: sorted open-offsets (hours) for successive versions; a flag per
# version marks tombstones
versions_strategy = st.lists(
    st.tuples(
        st.lists(
            st.integers(min_value=0, max_value=200), min_size=1, max_size=4,
            unique=True,
        ),
        st.lists(st.booleans(), min_size=4, max_size=4),
    ),
    min_size=1,
    max_size=4,
)
facts_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),  # key index
              st.integers(min_value=-5, max_value=210)),  # ts offset (hours)
    min_size=1,
    max_size=30,
)


def _hours(h: int) -> dt.datetime:
    return T0 + dt.timedelta(hours=h)


@pytest.mark.slow  # corpus-sweep/long-property tier (see pytest.ini)
@given(versions=versions_strategy, facts=facts_strategy)
@settings(**HYP)
def test_asof_merge_equals_broadcast(spark, versions, facts):
    dim_rows = []
    for ki, (offsets, dels) in enumerate(versions):
        opens = sorted(offsets)
        for vi, off in enumerate(opens):
            eff_from = _hours(off)
            eff_to = _hours(opens[vi + 1]) if vi + 1 < len(opens) else INF
            flg = "Y" if dels[vi] else "N"
            dim_rows.append((f"k{ki}", eff_from, eff_to, flg, f"k{ki}v{vi}"))
    dim = spark.createDataFrame(
        dim_rows,
        "key string, effective_from timestamp, effective_to timestamp, "
        "deleted_flg string, payload string",
    )
    fact = spark.createDataFrame(
        [(i, f"k{ki}", _hours(off)) for i, (ki, off) in enumerate(facts)],
        "fid long, fkey string, fts timestamp",
    )
    cols = ["fid", "payload", "effective_from"]
    base = asof_join(
        fact, dim, fact_key="fkey", dim_key="key", fact_ts="fts",
        strict=True, only_live=True, how="left",
    ).select(F.col("f.fid"), F.col("d.payload"), F.col("d.effective_from"))
    merge = asof_join_merge(
        fact, dim, fact_key="fkey", dim_key="key", fact_ts="fts",
        strict=True, only_live=True, how="left",
    ).select(*cols)
    assert sorted(map(tuple, merge.collect())) == sorted(map(tuple, base.collect()))


intervals_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),     # key index
              st.integers(min_value=0, max_value=300),   # start (minutes)
              st.integers(min_value=1, max_value=120)),  # duration (minutes)
    min_size=1,
    max_size=20,
)


@pytest.mark.slow  # corpus-sweep/long-property tier (see pytest.ini)
@given(ls=intervals_strategy, rs=intervals_strategy)
@settings(**HYP)
def test_interval_binned_equals_naive(spark, ls, rs):
    left = spark.createDataFrame(
        [(i, f"k{k}", _hours(0) + dt.timedelta(minutes=s),
          _hours(0) + dt.timedelta(minutes=s + d)) for i, (k, s, d) in enumerate(ls)],
        "lid long, lk string, l_start timestamp, l_end timestamp",
    )
    right = spark.createDataFrame(
        [(i, f"k{k}", _hours(0) + dt.timedelta(minutes=s),
          _hours(0) + dt.timedelta(minutes=s + d)) for i, (k, s, d) in enumerate(rs)],
        "rid long, rk string, r_start timestamp, r_end timestamp",
    )
    got = interval_overlap_join(
        left, right.withColumnRenamed("rk", "lk"),
        left_start="l_start", left_end="l_end",
        right_start="r_start", right_end="r_end",
        on=["lk"], bin_width_seconds=1800,
    ).select("lid", "rid")
    naive = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.lk") == F.col("r.rk"))
            & (F.col("l.l_start") < F.col("r.r_end"))
            & (F.col("r.r_start") < F.col("l.l_end")),
            "inner",
        )
        .select("lid", "rid")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
