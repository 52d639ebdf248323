"""Union-merge as-of join: exact equivalence with the broadcast variant.

The two implementations (operators/asof.py) must agree row-for-row on any
input — boundary timestamps, tombstones, keys with no dim, facts before the
first version, multiple versions per key. The broadcast join is the trusted
baseline (it is the literal J4 condition, report.py:38-41); the merge join
is the scale path.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_process_spark.operators.asof import asof_join, asof_join_merge


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


INF = _ts("9999-12-31 00:00:00")


@pytest.fixture(scope="module")
def asof_data(spark):
    # dim: key k1 has 3 versions (middle one deleted), k2 has 1, k3 none
    dim = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01 00:00:00"), _ts("2024-01-09 23:59:59"), "N", "v1"),
            ("k1", _ts("2024-01-10 00:00:00"), _ts("2024-01-19 23:59:59"), "Y", "v2"),
            ("k1", _ts("2024-01-20 00:00:00"), INF, "N", "v3"),
            ("k2", _ts("2024-02-01 00:00:00"), INF, "N", "w1"),
        ],
        "key string, effective_from timestamp, effective_to timestamp, "
        "deleted_flg string, payload string",
    )
    fact = spark.createDataFrame(
        [
            (1, "k1", _ts("2023-12-31 00:00:00")),  # before first version
            (2, "k1", _ts("2024-01-01 00:00:00")),  # exactly on boundary (strict!)
            (3, "k1", _ts("2024-01-05 12:00:00")),  # inside v1
            (4, "k1", _ts("2024-01-09 23:59:59")),  # exactly on close boundary
            (5, "k1", _ts("2024-01-15 00:00:00")),  # inside deleted v2
            (6, "k1", _ts("2024-01-20 00:00:00")),  # on v3 open boundary
            (7, "k1", _ts("2024-03-01 00:00:00")),  # inside open v3
            (8, "k2", _ts("2024-02-02 00:00:00")),  # inside w1
            (9, "k3", _ts("2024-02-02 00:00:00")),  # key with no dim at all
        ],
        "fid long, fkey string, fts timestamp",
    )
    return fact, dim


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("strict", [True, False])
@pytest.mark.parametrize("only_live", [True, False])
@pytest.mark.parametrize("how", ["left", "inner"])
def test_merge_matches_broadcast(spark, asof_data, strict, only_live, how):
    fact, dim = asof_data
    cols = ["fid", "fkey", "fts", "effective_from", "effective_to", "payload"]
    base = asof_join(
        fact, dim, fact_key="fkey", dim_key="key", fact_ts="fts",
        strict=strict, only_live=only_live, how=how,
    ).select(
        *[F.col(f"f.{c}") for c in fact.columns],
        *[F.col(f"d.{c}") for c in ("effective_from", "effective_to", "payload")],
    )
    merge = asof_join_merge(
        fact, dim, fact_key="fkey", dim_key="key", fact_ts="fts",
        strict=strict, only_live=only_live, how=how,
    ).select(*cols)
    assert _canon(merge) == _canon(base.select(*cols))


def test_strict_boundary_matches_nothing(spark, asof_data):
    fact, dim = asof_data
    out = asof_join_merge(
        fact, dim, fact_key="fkey", dim_key="key", fact_ts="fts",
        strict=True, only_live=True, how="left",
    )
    by_id = {r["fid"]: r["payload"] for r in out.collect()}
    assert by_id[2] is None  # ts == effective_from: strict → no match
    assert by_id[3] == "v1"
    assert by_id[4] is None  # ts == effective_to: strict → no match
    assert by_id[5] is None  # inside a tombstoned version
    assert by_id[6] is None  # on v3 open boundary
    assert by_id[7] == "v3"
    assert by_id[9] is None  # no dim for key


def test_merge_rejects_column_clash(spark, asof_data):
    fact, dim = asof_data
    with pytest.raises(ValueError, match="clash"):
        asof_join_merge(
            fact.withColumn("payload", F.lit("x")), dim,
            fact_key="fkey", dim_key="key", fact_ts="fts",
        )
