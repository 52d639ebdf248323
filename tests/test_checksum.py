"""table_checksum: mutation sensitivity + order/partitioning invariance."""

from __future__ import annotations

from etl_process_spark.operators.merge import table_checksum


def _sig(spark, rows, parts=1):
    df = spark.createDataFrame(
        rows, "id long, name string, amount double"
    ).repartition(parts)
    return table_checksum(
        df, cols=["id", "name", "amount"], decimal_cols=["amount"]
    ).collect()[0]


BASE = [(1, "a", 10.5), (2, "b", 20.25), (3, "c", 0.0)]


def test_checksum_invariant_to_order_and_partitioning(spark):
    a = _sig(spark, BASE, parts=1)
    b = _sig(spark, list(reversed(BASE)), parts=7)
    assert a == b
    assert a["n_rows"] == 3
    assert a["sum_amount"] is not None


def test_checksum_detects_mutation_delete_and_duplicate(spark):
    base = _sig(spark, BASE)
    mutated = _sig(spark, [(1, "a", 10.5), (2, "b", 20.26), (3, "c", 0.0)])
    deleted = _sig(spark, BASE[:2])
    duped = _sig(spark, BASE + [BASE[0]])
    assert mutated["xor_sig"] != base["xor_sig"]
    assert deleted["xor_sig"] != base["xor_sig"]
    # a duplicated row XORs its digest back out — the count + control
    # total are what catch pure duplication, which is why the checksum
    # always carries all three fields
    assert duped["n_rows"] != base["n_rows"]
    assert duped["sum_amount"] != base["sum_amount"]


def test_checksum_null_handling_stable(spark):
    rows = [(1, None, 1.0), (2, "x", None)]
    a = _sig(spark, rows, parts=1)
    b = _sig(spark, list(reversed(rows)), parts=3)
    assert a == b


def test_checksum_distinguishes_null_from_empty_string(spark):
    a = _sig(spark, [(1, None, 1.0)])
    b = _sig(spark, [(1, "", 1.0)])
    assert a["xor_sig"] != b["xor_sig"]


def test_batchwise_checksum_fold_equals_full_recompute(spark):
    from etl_process_spark.operators.merge import combine_checksums

    rows = [(i, f"name{i % 7}", float(i) * 1.25) for i in range(97)]
    full_df = spark.createDataFrame(rows, "id long, name string, amount double")
    full = table_checksum(
        full_df, cols=["id", "name", "amount"], decimal_cols=["amount"]
    ).collect()[0]
    # three uneven batches, one empty
    splits = [rows[:40], rows[40:41], [], rows[41:]]
    parts = None
    for batch in splits:
        df = spark.createDataFrame(batch, "id long, name string, amount double")
        ck = table_checksum(
            df, cols=["id", "name", "amount"], decimal_cols=["amount"]
        )
        parts = ck if parts is None else parts.unionByName(ck)
    folded = combine_checksums(parts).collect()[0]
    assert folded["n_rows"] == full["n_rows"]
    assert folded["xor_sig"] == full["xor_sig"]
    assert folded["sum_amount"] == full["sum_amount"]
