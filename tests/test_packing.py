"""pack_sequences invariants: k=1 equals the single-lane layout; k>1
partitions docs losslessly into lanes that each obey the packing rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_process_spark.operators.packing import pack_sequences, pack_summary


@pytest.fixture()
def docs(spark):
    rows = [
        # (doc_id, lang, n_tokens) — includes an over-budget doc (700)
        (i, "en" if i % 3 else "de", [120, 700, 64, 256, 31, 512, 200, 90][i % 8])
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")


def _expected_single_lane(rows, budget):
    """Greedy running-total rule, computed in plain Python per group."""
    out = {}
    by_group: dict = {}
    for doc_id, lang, n in sorted(rows):
        by_group.setdefault(lang, []).append((doc_id, n))
    for lang, items in by_group.items():
        cum = 0
        for doc_id, n in items:
            out[doc_id] = (lang, cum // budget)
            cum += n
    return out


def test_k1_matches_reference_rule(docs):
    rows = [(r.doc_id, r.lang, r.n_tokens) for r in docs.collect()]
    expected = _expected_single_lane(rows, budget=512)
    got = {
        r.doc_id: (r.lang, r.seq_id)
        for r in pack_sequences(docs, budget=512, shards=1).collect()
    }
    assert got == expected


def test_sharded_is_lossless_partition(docs):
    assigned = pack_sequences(docs, budget=512, shards=4)
    # every doc assigned exactly once, shard in [0, 4)
    assert assigned.count() == docs.count()
    assert assigned.select("doc_id").distinct().count() == docs.count()
    bad = assigned.filter((F.col("shard") < 0) | (F.col("shard") >= 4)).count()
    assert bad == 0
    # token mass is conserved through the summary
    total = docs.agg(F.sum("n_tokens")).first()[0]
    packed = pack_summary(assigned).agg(F.sum("total_tokens")).first()[0]
    assert packed == total


def test_each_shard_obeys_single_lane_rule(docs):
    """A lane of the sharded run must equal an unsharded run over just
    that lane's documents — shards are independent packing streams."""
    assigned = pack_sequences(docs, budget=512, shards=3)
    for shard in range(3):
        lane_docs = assigned.filter(F.col("shard") == shard).select(
            "doc_id", "lang", "n_tokens"
        )
        lane_expected = {
            r.doc_id: (r.lang, r.seq_id)
            for r in pack_sequences(lane_docs, budget=512, shards=1).collect()
        }
        lane_got = {
            r.doc_id: (r.lang, r.seq_id)
            for r in assigned.filter(F.col("shard") == shard).collect()
        }
        assert lane_got == lane_expected


def test_oversize_doc_gets_own_bin_boundary(spark):
    """A doc exceeding the budget overflows its sequence but is never
    split; the next doc starts a later sequence."""
    df = spark.createDataFrame(
        [(1, "en", 700), (2, "en", 100), (3, "en", 100)],
        "doc_id long, lang string, n_tokens long",
    )
    got = {
        r.doc_id: r.seq_id for r in pack_sequences(df, budget=512, shards=1).collect()
    }
    # doc1 starts at cum=0 -> seq 0 (overflows to 700); doc2 preceding
    # cum=700 -> seq 1; doc3 preceding cum=800 -> seq 1
    assert got == {1: 0, 2: 1, 3: 1}


def test_shards_must_be_positive(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, shards=0)


def test_pack_texts_order_and_separator(spark):
    from etl_process_spark.operators.packing import pack_sequences, pack_texts

    df = spark.createDataFrame(
        [(2, "en", "beta", 300), (1, "en", "alpha", 300), (3, "en", "gamma", 100)],
        "doc_id long, lang string, text string, n_tokens long",
    )
    assigned = pack_sequences(df, budget=512, shards=1)
    out = {(r.seq_id): (r.seq_text, r.n_docs)
           for r in pack_texts(assigned).collect()}
    # seq 0: doc1 (cum 0) + doc2 (cum 300); doc3 starts at cum 600 -> seq 1
    assert out[0] == ("alpha <|doc|> beta", 2)
    assert out[1] == ("gamma", 1)
