"""SCD1 merge_upsert: update / insert / delete slices, idempotence, and
catalog atomicity."""

from __future__ import annotations

from etl_process_spark.operators.merge import catalog_merge, merge_upsert
from etl_process_spark.sources.tables import TableCatalog


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_updates_inserts_and_deletes(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    source = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    deletes = spark.createDataFrame([(3,)], "id long")
    merged = merge_upsert(target, source, "id", delete_keys=deletes)
    assert _rows(merged) == [
        (1, "a", 10.0),   # untouched
        (2, "b2", 21.0),  # updated (source wins)
        (4, "d", 40.0),   # inserted
    ]  # id=3 deleted


def test_merge_is_idempotent(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    source = spark.createDataFrame([(2, "b2"), (3, "c")], "id long, name string")
    once = merge_upsert(target, source, "id")
    twice = merge_upsert(once, source, "id")
    assert _rows(once) == _rows(twice)


def test_merge_multi_column_key(spark):
    target = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "id long, sub string, v double"
    )
    source = spark.createDataFrame([(1, "y", 9.0)], "id long, sub string, v double")
    merged = merge_upsert(target, source, ["id", "sub"])
    assert _rows(merged) == [(1, "x", 1.0), (1, "y", 9.0)]


def test_catalog_merge_swaps_versions_atomically(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "wh"))
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    catalog_merge(cat, "dim", v1, "id")  # bootstrap
    assert len(cat.versions("dim")) == 1
    catalog_merge(
        cat, "dim", spark.createDataFrame([(2, "b2")], "id long, name string"), "id"
    )
    assert _rows(cat.read("dim")) == [(1, "a"), (2, "b2")]
    # previous version still readable (time travel), new version is current
    versions = cat.versions("dim")
    assert len(versions) == 2
    assert _rows(cat.read_version("dim", versions[0])) == [(1, "a"), (2, "b")]


def test_snapshot_diff_classifies_and_null_safe(spark):
    from etl_process_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),      # unchanged -> dropped
         (2, "b", 20.0),      # NULL -> value: update (null-safe)
         (4, None, 40.0),     # unchanged incl. NULL field -> dropped
         (5, "e", 50.0)],     # insert
        "k long, s string, v double",
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(
        old, new, "k", ["s", "v"]).collect()}
    assert got == {2: "update", 3: "delete", 5: "insert"}


def test_snapshot_diff_property_random(spark):
    """Random snapshot pairs vs a dict-based reference: classification,
    old/new images, and unchanged-row suppression."""
    import random

    rng = random.Random(23)
    for _ in range(5):
        keys = range(12)
        mk = lambda: {
            k: (rng.choice(["a", "b", None]), rng.choice([1.0, 2.0, None]))
            for k in keys if rng.random() < 0.7
        }
        o, n = mk(), mk()
        old = spark.createDataFrame(
            [(k, s, v) for k, (s, v) in o.items()], "k long, s string, v double"
        )
        new = spark.createDataFrame(
            [(k, s, v) for k, (s, v) in n.items()], "k long, s string, v double"
        )
        from etl_process_spark.operators.merge import snapshot_diff

        got = {r["k"]: r["change_type"] for r in snapshot_diff(
            old, new, "k", ["s", "v"]).collect()}
        want = {}
        for k in set(o) | set(n):
            if k not in n:
                want[k] = "delete"
            elif k not in o:
                want[k] = "insert"
            elif o[k] != n[k]:
                want[k] = "update"
        assert got == want


def test_snapshot_diff_drives_scd2_history(spark):
    """Lakehouse composition: plain snapshots → snapshot_diff CDC →
    scd2_merge must build the SAME history as feeding the snapshots to
    scd2_merge directly (with full-snapshot delete detection). The diff
    is the small side at scale — only changed keys touch the dimension,
    exactly the reference's incremental pull but derived from snapshots
    that never recorded changes."""
    from pyspark.sql import functions as F

    from etl_process_spark.operators.merge import snapshot_diff
    from etl_process_spark.operators.scd2 import scd2_init, scd2_merge

    snap1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    )
    # 2 updated, 3 deleted, 4 inserted, 1 unchanged
    snap2 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b2", 21.0), (4, "d", 40.0)],
        "id long, name string, v double",
    )
    tracked = ["name", "v"]
    t1, t2 = F.lit("2024-01-01"), F.lit("2024-01-02")

    dim = scd2_init(snap1, "id", tracked, effective_from=t1)

    # direct path: full snapshot 2 with snapshot delete detection
    direct = scd2_merge(
        dim, snap2, "id", tracked,
        new_effective_from=t2, changed_effective_from=t2,
        source_keys=snap2.select("id"), clock="2024-01-02 00:00:00",
    )

    # CDC path: diff the snapshots, split by change type
    diff = snapshot_diff(snap1, snap2, "id", tracked)
    upserts = diff.where(F.col("change_type") != "delete").select(
        "id",
        *[F.col(f"new_{c}").alias(c) for c in tracked],
    )
    keep_keys = snap1.select("id").union(snap2.select("id")).distinct().join(
        diff.where(F.col("change_type") == "delete").select("id"),
        "id", "left_anti",
    )
    via_cdc = scd2_merge(
        dim, upserts, "id", tracked,
        new_effective_from=t2, changed_effective_from=t2,
        source_keys=keep_keys, clock="2024-01-02 00:00:00",
    )

    cols = ["id", "name", "v", "effective_from", "effective_to", "deleted_flg"]
    assert _rows(direct.select(*cols)) == _rows(via_cdc.select(*cols))
    # sanity: the history really evolved — 2 versions for id=2, tombstone for 3
    assert direct.where("id = 2").count() == 2
    assert direct.where("id = 3 and deleted_flg = 'Y'").count() == 1
