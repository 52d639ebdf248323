"""Pandas-path differential audit: Spark ``toPandas()`` vs DuckDB ``.df()``.

The local differential (tools/run_differential.py) compares collect()/
fetchall() rows — but a driver hashing through PANDAS materializations
sees different renderings for several type classes (DuckDB HUGEINT →
float64 '123.0'; DECIMAL trailing zeros '…,60' → float64 '…,6'; the SCD2
9999-12-31 sentinel overflowing timestamp[ns] and CRASHING the Arrow
conversion). This audit runs every oracle-paired query through BOTH
pandas materializations with column-wise canonicalization and demands
exact agreement — the strictest local approximation of a pandas-based
driver compare. Round-4 state: 195/195 clean.

Usage: python tools/pandas_path_audit.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import datetime as dt
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from etl_process_spark.queries import QUERIES  # noqa: E402
from etl_process_spark.queries.differential import TABLES  # noqa: E402
from etl_process_spark.session import get_spark  # noqa: E402


def canon_col(s: pd.Series) -> list[str]:
    """Column-wise canonicalization (NEVER row-wise: DataFrame.iterrows
    upcasts a mixed row to one dtype, manufacturing float renderings of
    integer columns)."""
    out = []
    for v in s:
        if v is None or v is pd.NaT or (
            isinstance(v, (float, np.floating)) and math.isnan(v)
        ):
            out.append("NULL")
        elif isinstance(v, (np.floating, float)):
            out.append(repr(float(v)))
        elif isinstance(v, (np.integer, int)) and not isinstance(v, bool):
            out.append(str(int(v)))
        elif isinstance(v, (pd.Timestamp, dt.datetime)):
            out.append(v.strftime("%Y-%m-%d %H:%M:%S"))
        elif isinstance(v, dt.date):
            out.append(v.strftime("%Y-%m-%d") + " 00:00:00")
        elif isinstance(v, (list, np.ndarray)):
            out.append("[" + ",".join(str(x) for x in v) + "]")
        else:
            out.append(str(v))
    return out


def canon_df(df: pd.DataFrame):
    cols = sorted(df.columns)
    mat = list(zip(*[canon_col(df[c]) for c in cols])) if len(df) else []
    mat.sort()
    return mat


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("pandas_path_audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = 0
    n = 0
    for name in sorted(QUERIES):
        spec = QUERIES[name]
        if spec.oracle is None:
            continue
        n += 1
        try:
            a = canon_df(spec.builder(spark, sf).toPandas())
            b = canon_df(con.execute(spec.oracle).df())
            if a != b:
                bad += 1
                only_a = [x for x in a if x not in set(b)][:2]
                only_b = [x for x in b if x not in set(a)][:2]
                print(f"MISMATCH {name} spark-only={only_a} duckdb-only={only_b}")
        except Exception as e:  # a crash IS a finding (e.g. ns overflow)
            bad += 1
            print(f"ERR {name} {e!r}"[:300])
    print(f"{n - bad}/{n} pandas-path clean")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
