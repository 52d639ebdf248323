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
