"""Point-in-time (as-of) join against an SCD2 dimension.

Reference J4 (py_scripts/report.py:38-41): the fraud report joins each
transaction to the terminal version that was effective when the transaction
happened:

    tr LEFT JOIN ter ON tr.terminal = ter.terminal_id
                    AND tr.trans_date > ter.effective_from
                    AND tr.trans_date < ter.effective_to
                    AND ter.deleted_flg = 'N'

Semantic corner preserved exactly: the inequalities are STRICT — a
transaction timestamped exactly on a version boundary matches *no* version
(SURVEY §7 "hard parts").

Physical strategy: the equi-key part drives the join; Catalyst plans it as a
broadcast-hash join when the dimension is small (always true for SCD2 dims —
hinted here) with the band predicate applied as a post-join filter. That
plan is scale-independent in the fact table: 100 TB of facts stream through
map-side lookups with zero shuffle. For a dimension too large to broadcast,
the same condition degrades gracefully to a sort-merge join on the key with
the band as filter (set ``broadcast_dim=False``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    fact_ts: str,
    effective_from: str = "effective_from",
    effective_to: str = "effective_to",
    strict: bool = True,
    only_live: bool = True,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join each fact row to the dim version effective at the fact timestamp."""
    d = F.broadcast(dim) if broadcast_dim else dim
    f, dd = fact.alias("f"), d.alias("d")
    ts = F.col(f"f.{fact_ts}")
    if strict:
        band = (ts > F.col(f"d.{effective_from}")) & (ts < F.col(f"d.{effective_to}"))
    else:
        band = (ts >= F.col(f"d.{effective_from}")) & (ts < F.col(f"d.{effective_to}"))
    cond = (F.col(f"f.{fact_key}") == F.col(f"d.{dim_key}")) & band
    if only_live:
        cond = cond & (F.col("d.deleted_flg") == "N")
    return f.join(dd, cond, how)
