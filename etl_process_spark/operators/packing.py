"""Sequence packing: concatenate documents into fixed-token-budget
training sequences (reference scope: the training-data-prep extension
surface — no analog in annavelk/ETL-process, which stops at tabular
fraud marts; this is the standard pre-training batch-shaping step).

A document is assigned to the sequence its PRECEDING cumulative token
count falls into (``(cum - own) div budget``) within its partition
group, in deterministic ``order_by`` order — the greedy streaming rule
that packs short docs into full context windows without padding waste.

Scale design: a window partitioned by ``lang`` alone funnels every
document of a language through ONE reducer — a non-starter at 100 TB.
``shards > 1`` splits each partition group into k independent packing
lanes (``shard = pmod(shard_expr, k)``); the window partitions on
(group, shard), so the cumsum parallelizes k-way. The price is at most
k partially-filled tail sequences per group instead of one — noise at
training scale. ``shards=1`` reproduces the single-lane layout exactly
(the oracle-checkable special case).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    n_tokens: str = "n_tokens",
    order_by: str = "doc_id",
    budget: int = 512,
    partition_by: Sequence[str] = ("lang",),
    shards: int = 1,
    shard_expr: Column | None = None,
) -> DataFrame:
    """Per-document packed-sequence assignment.

    Returns the input columns plus ``shard`` (long) and ``seq_id``
    (long). A sequence is addressed by ``(*partition_by, shard,
    seq_id)``; aggregate on that key for per-sequence stats.

    ``shard_expr`` defaults to ``hash(order_by)`` — decorrelates lanes
    from id assignment patterns. Pass a deterministic expression (e.g.
    ``F.col("doc_id")``) when cross-engine reproducibility matters:
    Spark's ``hash`` is engine-specific murmur3.

    One shuffle on (partition_by, shard) for the window cumsum; the bin
    id is a map-side expression after it. Docs larger than ``budget``
    still occupy (and overflow) one sequence — the rule never splits a
    document.
    """
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    base = shard_expr if shard_expr is not None else F.hash(F.col(order_by))
    shard = F.pmod(base.cast("long"), F.lit(shards)).cast("long")
    out = df.withColumn("shard", shard)
    w = (
        Window.partitionBy(*partition_by, "shard")
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_tokens).over(w)
    return out.withColumn(
        "seq_id",
        F.floor((cum - F.col(n_tokens)) / F.lit(budget)).cast("long"),
    )


def pack_summary(
    assigned: DataFrame,
    n_tokens: str = "n_tokens",
    partition_by: Sequence[str] = ("lang",),
) -> DataFrame:
    """Per-sequence rollup of a ``pack_sequences`` assignment:
    ``(*partition_by, shard, seq_id, n_docs, total_tokens)``."""
    return assigned.groupBy(*partition_by, "shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).alias("total_tokens"),
    )


def pack_texts(
    assigned: DataFrame,
    text_col: str = "text",
    order_by: str = "doc_id",
    partition_by: Sequence[str] = ("lang",),
    sep: str = " <|doc|> ",
) -> DataFrame:
    """Materialize the packed sequences as TEXT — the actual training
    shard: documents of each ``(*partition_by, shard, seq_id)`` sequence
    concatenated in ``order_by`` order with a document separator token.

    One (group, shard, seq)-keyed aggregate; within-sequence order is
    pinned by sorting struct(order_key, text) pairs inside the group, so
    the output string is deterministic under any partitioning (shuffles
    do not reorder it). Sequence groups are budget-bounded (≈ the token
    budget per sequence), so the collect_list never builds an unbounded
    row — the safety the packing rule itself guarantees.
    """
    pair = F.struct(F.col(order_by).alias("o"), F.col(text_col).alias("t"))
    return (
        assigned.groupBy(*partition_by, "shard", "seq_id")
        .agg(F.array_sort(F.collect_list(pair)).alias("ps"))
        .select(
            *partition_by, "shard", "seq_id",
            F.array_join(
                F.transform("ps", lambda p: p["t"]), sep
            ).alias("seq_text"),
            F.size("ps").alias("n_docs"),
        )
    )
