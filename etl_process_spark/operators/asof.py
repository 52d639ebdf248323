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

from pyspark.sql import DataFrame, Window
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


def asof_join_merge(
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
) -> DataFrame:
    """As-of join for dimensions too large to broadcast — the scale path.

    ``asof_join`` above is the right plan while the dim fits in a broadcast
    (every SCD2 dim in the reference does). When it doesn't — a billion-key
    dimension against 100 TB of facts — a broadcast is impossible and the
    sort-merge fallback compares every fact row against EVERY version of its
    key. This variant is the classic union-merge as-of instead:

      1. tag dim versions as events at ``effective_from`` and union them
         with fact rows on the key;
      2. one window sorted by (key, ts, tie-break) carries the most recent
         version's payload forward onto each fact row
         (``last(..., ignorenulls=True)``);
      3. validate the carried version's expiry/liveness post-hoc.

    Cost: ONE shuffle of facts ∪ versions on the key, each version touched
    once regardless of how many facts it serves. Step 3 is equivalent to
    pre-filtering because SCD2 intervals per key are non-overlapping: if the
    latest version opened at-or-before ts has expired (or is a tombstone),
    no other version can contain ts.

    Strictness parity with J4 (report.py:38-41): at ``ts ==
    effective_from`` a strict join must NOT match that version, so fact
    rows sort BEFORE dim events on ties; non-strict sorts them after.

    Output: all fact columns, then the dim payload columns (everything but
    ``dim_key``), nulled where no version matches (``how="left"``) or
    dropped (``how="inner"``). Requires fact/dim column names to be
    disjoint apart from the key.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how={how!r}: only left/inner")
    payload_cols = [c for c in dim.columns if c != dim_key]
    clash = set(payload_cols) & set(fact.columns)
    if clash:
        raise ValueError(f"fact/dim column clash: {sorted(clash)}")

    # Facts-first on equal ts when strict (version not yet visible),
    # dims-first when non-strict (version visible at its open instant).
    fact_rank, dim_rank = (0, 1) if strict else (1, 0)
    f_evt = fact.select(
        F.col(fact_key).alias("__k"),
        F.col(fact_ts).alias("__ts"),
        F.lit(fact_rank).alias("__rk"),
        F.struct(*fact.columns).alias("__fact"),
        F.lit(None).cast(
            dim.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType
        ).alias("__dim"),
    )
    d_evt = dim.select(
        F.col(dim_key).alias("__k"),
        F.col(effective_from).alias("__ts"),
        F.lit(dim_rank).alias("__rk"),
        F.lit(None).cast(
            fact.select(F.struct(*fact.columns).alias("s")).schema["s"].dataType
        ).alias("__fact"),
        F.struct(*payload_cols).alias("__dim"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        f_evt.unionByName(d_evt)
        .withColumn("__v", F.last("__dim", ignorenulls=True).over(w))
        .filter(F.col("__fact").isNotNull())
    )
    # Post-hoc validation: carried version must still be open at ts ...
    valid = F.col("__v").isNotNull() & (F.col("__ts") < F.col(f"__v.{effective_to}"))
    if only_live:  # ... and not a tombstone (J4's deleted_flg = 'N')
        valid = valid & (F.col("__v.deleted_flg") == "N")
    merged = merged.withColumn(
        "__m", F.when(valid, F.col("__v")).otherwise(F.lit(None))
    )
    if how == "inner":
        merged = merged.filter(F.col("__m").isNotNull())
    return merged.select(
        *[F.col(f"__fact.{c}").alias(c) for c in fact.columns],
        *[F.col(f"__m.{c}").alias(c) for c in payload_cols],
    )
