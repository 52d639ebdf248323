"""Local replica of the driver's DuckDB-differential correctness gate.

Runs a QuerySpec's Spark build and its DuckDB oracle over the same parquet
tables and compares (row count, column names, canonicalized values). The
driver sorts columns by name before hashing, so column NAMES must match;
values are canonicalized to strings the way both engines would render them.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os

import duckdb
from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _rows_to_canonical(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # the driver testdata ships single parquet FILES; engine-written
        # corpora (the 10x scale replica) are Spark DIRECTORIES of parts
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            # partial corpora (the 100x big tier replicates only the
            # tables its two queries read) — skip; a query referencing a
            # missing table fails loudly at execution
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def compare(
    spark: SparkSession, sf_dir: str, spec, duckdb_pragmas: list[str] | None = None
) -> dict:
    """Run spec both ways; return a result dict (match flags + diagnostics).

    ``duckdb_pragmas`` are SET statements applied to the oracle
    connection first — used by the 10x-replica differential to cap
    DuckDB's memory and give it a spill directory (the in-memory default
    has NO temp dir, so blocking operators can't go out-of-core and the
    heaviest oracles OOM at scale instead of spilling)."""
    sdf = spec.builder(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = {"name": spec.name, "rows_spark": len(s_rows)}
    if spec.oracle is None:
        res.update(oracle=False, rows_match=None, ok=len(s_rows) >= 0)
        return res

    # canonicalize each side as soon as its raw rows exist and free them
    # immediately: at the 10x replica the biggest queries collect
    # millions of rows, and holding raw tuples for BOTH engines plus
    # both canonical forms doubled peak driver memory (seen as DuckDB
    # bad_alloc cascades once the box filled)
    s_canon = _rows_to_canonical(s_cols, s_rows)
    del s_rows

    con = duckdb_connection(sf_dir)
    try:
        for pragma in duckdb_pragmas or []:
            con.execute(pragma)
        cur = con.execute(spec.oracle)
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()
    finally:
        con.close()

    res["rows_duckdb"] = len(o_rows)
    res["cols_match"] = sorted(s_cols) == sorted(o_cols)
    res["rows_match"] = res["rows_spark"] == len(o_rows)
    if not res["cols_match"]:
        res["ok"] = False
        res["detail"] = f"columns spark={sorted(s_cols)} duckdb={sorted(o_cols)}"
        return res

    o_canon = _rows_to_canonical(o_cols, o_rows)
    del o_rows
    res["values_match"] = s_canon == o_canon
    res["ok"] = res["rows_match"] and res["values_match"]
    if not res["ok"]:
        diff_s = [r for r in s_canon if r not in set(o_canon)][:3]
        diff_o = [r for r in o_canon if r not in set(s_canon)][:3]
        res["detail"] = f"spark-only={diff_s} duckdb-only={diff_o}"
    return res
