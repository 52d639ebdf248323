"""Differential gate: every registered query must match its DuckDB oracle.

Replicates the driver's t2 gate locally at sf0.001 (fast); run with
SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 for the driver-scale check.
"""

from __future__ import annotations

import os

import pytest

from etl_process_spark.queries import QUERIES
from etl_process_spark.queries.differential import compare

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    spec = QUERIES[name]
    res = compare(spark, SF_DIR, spec)
    assert res["ok"], res
    if spec.oracle is not None:
        assert res["rows_spark"] > 0 or res["rows_duckdb"] == 0, res
