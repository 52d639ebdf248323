"""SCD2 merge unit tests (SURVEY §5.1): new / changed / deleted / resurrected
keys, null-safe change detection, the -1 second close, idempotency."""

import datetime as dt

from pyspark.sql import functions as F

from etl_process_spark.operators.scd2 import scd2_current, scd2_init, scd2_merge

INF = dt.datetime(9999, 12, 31)
T0 = dt.datetime(2021, 1, 1)
T1 = dt.datetime(2021, 1, 2)
CLOCK = dt.datetime(2021, 1, 2, 12, 0, 0)

TRACKED = ["city", "kind"]


def _dim0(spark):
    batch = spark.createDataFrame(
        [("A", "Moscow", "POS"), ("B", "Perm", "ATM"), ("C", None, "POS")],
        ["tid", "city", "kind"],
    )
    return scd2_init(batch, "tid", TRACKED, F.lit(str(T0)))


def _merge_snapshot(dim, batch, ts):
    return scd2_merge(
        dim, batch, "tid", TRACKED,
        new_effective_from=F.lit(str(ts)),
        changed_effective_from=F.lit(str(ts)),
        source_keys=batch,
        clock=CLOCK,
    )


def _timeline(df, tid):
    rows = df.filter(F.col("tid") == tid).orderBy("effective_from").collect()
    return [(r.city, r.kind, r.effective_from, r.effective_to, r.deleted_flg) for r in rows]


def test_scd2_full_snapshot_evolution(spark):
    dim = _dim0(spark)
    # day 2 snapshot: A changed city, B gone (delete), C null->value, D new
    batch = spark.createDataFrame(
        [("A", "Kazan", "POS"), ("C", "Omsk", "POS"), ("D", "Tula", "ATM")],
        ["tid", "city", "kind"],
    )
    merged = _merge_snapshot(dim, batch, T1).cache()

    a = _timeline(merged, "A")
    assert a == [
        ("Moscow", "POS", T0, T1 - dt.timedelta(seconds=1), "N"),
        ("Kazan", "POS", T1, INF, "N"),
    ]
    # null -> value transition must be detected (null-safe P5)
    c = _timeline(merged, "C")
    assert c[0][0] is None and c[1][0] == "Omsk"
    # delete: tombstone opens at pinned clock, old closes 1s before
    b = _timeline(merged, "B")
    assert b == [
        ("Perm", "ATM", T0, CLOCK - dt.timedelta(seconds=1), "N"),
        ("Perm", "ATM", CLOCK, INF, "Y"),
    ]
    d = _timeline(merged, "D")
    assert d == [("Tula", "ATM", T1, INF, "N")]

    # invariants: exactly one open version per key; intervals don't overlap
    open_counts = (
        merged.filter(F.col("effective_to") == F.lit(str(INF)).cast("timestamp"))
        .groupBy("tid").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts)


def test_scd2_resurrection_and_idempotency(spark):
    dim = _dim0(spark)
    day2 = spark.createDataFrame([("A", "Moscow", "POS"), ("C", None, "POS")],
                                 ["tid", "city", "kind"])  # B deleted
    # materialize between merges, as the TableCatalog rewrite does in
    # production (each merge reads the PREVIOUS run's parquet, not a live
    # lineage of unions — also avoids SPARK's PartitioningCollection quirk)
    merged = _merge_snapshot(dim, day2, T1).localCheckpoint()
    t2 = dt.datetime(2021, 1, 3)
    day3 = spark.createDataFrame(
        [("A", "Moscow", "POS"), ("B", "Perm", "ATM"), ("C", None, "POS")],
        ["tid", "city", "kind"],
    )  # B resurrects
    merged2 = scd2_merge(
        merged, day3, "tid", TRACKED,
        new_effective_from=F.lit(str(t2)),
        changed_effective_from=F.lit(str(t2)),
        source_keys=day3, clock=t2,
    ).cache()
    b = _timeline(merged2, "B")
    assert b[-1] == ("Perm", "ATM", t2, INF, "N")  # resurrected open version
    assert b[-2][4] == "Y"  # tombstone closed

    # idempotency: re-merging the identical snapshot changes nothing
    merged3 = scd2_merge(
        merged2, day3, "tid", TRACKED,
        new_effective_from=F.lit(str(t2)),
        changed_effective_from=F.lit(str(t2)),
        source_keys=day3, clock=t2,
    )
    assert merged3.count() == merged2.count()
    assert merged3.exceptAll(merged2).count() == 0


def test_scd2_current_view(spark):
    dim = _dim0(spark)
    batch = spark.createDataFrame([("A", "Kazan", "POS")], ["tid", "city", "kind"])
    merged = _merge_snapshot(dim, batch, T1)
    cur = scd2_current(merged)
    assert {r.tid for r in cur.collect()} == {"A"}  # B, C tombstoned
