"""Keyed MERGE (SCD Type 1 upsert): update-matched / insert-new / optional
delete, as an atomic table rewrite.

The reference's correlated ``UPDATE ... FROM`` + insert pair
(``py_scripts/cards.py:125-141`` close/replace, ``:86-102`` insert) is SCD2;
this operator is its history-less sibling — the latest version WINS and old
rows are simply replaced. Spark has no in-place UPDATE, so the merge is
expressed as the union of two disjoint slices and swapped in atomically via
the TableCatalog's versioned-pointer overwrite (write-temp-then-swap,
SURVEY §7 "hard parts (a)").

Scale shape: ONE shuffle of the target (the anti join on the merge key) +
the source union — no window, no global sort. When the target lives in a
bucketed layout on the key (``TableCatalog.write_bucketed``) the anti join
plans with zero exchanges on the target side, making merge cost
O(source + touched buckets).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_process_spark.sources.tables import TableCatalog


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: list[str] | str,
    delete_keys: DataFrame | None = None,
) -> DataFrame:
    """Return the merged table: source rows win on key collision, target
    rows without a source match survive, keys in ``delete_keys`` drop.

    Whole-row semantics (the source must carry the full schema) — the
    MERGE every warehouse needs for dimension refresh where history is
    not tracked. Idempotent: re-merging the same source is a no-op.
    """
    keys = [key] if isinstance(key, str) else list(key)
    untouched = target.join(source, keys, "left_anti")
    merged = untouched.unionByName(source)
    if delete_keys is not None:
        merged = merged.join(delete_keys, keys, "left_anti")
    return merged


def catalog_merge(
    cat: TableCatalog,
    name: str,
    source: DataFrame,
    key: list[str] | str,
    delete_keys: DataFrame | None = None,
) -> None:
    """MERGE INTO a catalog table: read current version, merge, atomic
    pointer swap. Readers concurrently see either the old or the new
    version, never a mix."""
    if not cat.exists(name):
        cat.overwrite(name, source)
        return
    cat.overwrite(name, merge_upsert(cat.read(name), source, key, delete_keys))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    tracked: Sequence[str],
) -> DataFrame:
    """CDC between two table snapshots: classify every key as insert /
    update / delete (unchanged rows are dropped — the diff is the
    output, and at 100 TB it is the small side).

    One full-outer equi join on the key (both sides shuffle once on the
    same key — co-partitioned; full outer cannot broadcast) and a
    null-safe any-column-changed predicate (`functions/scalar.py::
    changed_any`). Output carries old_/new_ images of every tracked
    column, so a MERGE/SCD2 writer can consume it directly — this is
    the snapshot-diff primitive table formats expose as
    `table_changes`, derived here from plain snapshots.
    """
    from etl_process_spark.functions.scalar import changed_any

    o = old.select(key, *tracked).alias("o")
    n = new.select(key, *tracked).alias("n")
    ok, nk = F.col(f"o.{key}"), F.col(f"n.{key}")
    change = (
        F.when(ok.isNull(), F.lit("insert"))
        .when(nk.isNull(), F.lit("delete"))
        .when(changed_any("o", "n", tracked), F.lit("update"))
    )
    return (
        o.join(n, ok == nk, "full_outer")
        .select(
            F.coalesce(ok, nk).alias(key),
            change.alias("change_type"),
            *[F.col(f"o.{c}").alias(f"old_{c}") for c in tracked],
            *[F.col(f"n.{c}").alias(f"new_{c}") for c in tracked],
        )
        .where(F.col("change_type").isNotNull())
    )


def table_checksum(
    df: DataFrame,
    cols: Sequence[str],
    decimal_cols: Sequence[str] = (),
) -> DataFrame:
    """Order-independent table fingerprint: one row of
    ``(n_rows, xor_sig, ...sums)`` where ``xor_sig`` XORs a 60-bit md5
    digest of every row's canonical string form.

    The reconciliation primitive for verifying a migration, replica, or
    backfill WITHOUT sorting or moving either table: XOR and sums are
    commutative and associative, so any partitioning, any engine, and
    any row order produce the same signature from the same rows — and a
    single changed/missing/duplicated row flips it. Compare two tables
    by comparing two 1-row aggregates (one scan each, all partials
    map-side combined).

    ``cols`` are hashed in the given order after canonicalization:
    every column is cast to string EXCEPT those named in
    ``decimal_cols``, which pin through DECIMAL(12,2) first — raw
    double rendering is exactly what engines disagree on (the
    ``euro_decimal_parse`` lesson). Timestamps should be pre-cast by
    the caller to date or a fixed format for the same reason. NULLs
    pin to the ``\\N`` sentinel — ``concat_ws`` would otherwise SKIP
    them, making (NULL, x) and ('', x) rows collide undetectably. Each
    ``decimal_cols`` entry additionally contributes an exact
    ``sum_<col>`` DECIMAL(18,2) control total.
    """
    parts = [
        F.coalesce(
            (
                F.col(c).cast("decimal(12,2)").cast("string")
                if c in set(decimal_cols)
                else F.col(c).cast("string")
            ),
            F.lit("\\N"),
        )
        for c in cols
    ]
    row_sig = F.conv(
        F.substring(F.md5(F.concat_ws("|", *parts)), 1, 15), 16, 10
    ).cast("long")
    aggs = [F.count("*").alias("n_rows"), F.bit_xor(row_sig).alias("xor_sig")]
    for c in decimal_cols:
        aggs.append(
            F.sum(F.col(c).cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias(f"sum_{c}")
        )
    return df.agg(*aggs)


def combine_checksums(parts: DataFrame) -> DataFrame:
    """Fold per-batch ``table_checksum`` rows into the whole-table
    fingerprint: counts and control totals ADD, signatures XOR — all
    commutative, so checksumming a 100 TB table batch-by-batch as it
    ingests (one tiny row stored per batch) yields EXACTLY the
    signature a full recompute would, without ever re-reading history.
    The incremental-maintenance pattern of ``operators/incremental.py``
    applied to reconciliation: verify a replica against the running
    fold at any time for the cost of one 1-row aggregate.

    ``parts`` is a union of checksum rows (n_rows, xor_sig, sum_*...).
    """
    aggs = [
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.bit_xor("xor_sig").alias("xor_sig"),
    ]
    for c in parts.columns:
        if c.startswith("sum_"):
            aggs.append(F.sum(c).cast("decimal(18,2)").alias(c))
    return parts.agg(*aggs)
