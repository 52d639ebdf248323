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
    "image_decode_stats": ["mean_luma"],  # Python codec, both sides
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
