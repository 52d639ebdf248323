"""Deterministic stratified sampling (training-data mixture shaping).

Downsampling over-represented groups (languages, sources, domains) to a
target mixture is a standard pre-training step. ``df.sample()`` is the
wrong tool for it at scale: its RNG draw is neither reproducible across
engines nor stable under retries/repartitioning, so a failed-stage
re-execution can emit a DIFFERENT sample of the same partition. The
gate here is a pure hash of the row id — every engine, retry, and
partitioning agrees row-by-row on membership, the sample is exactly
re-derivable years later, and membership survives incremental appends
(a kept row stays kept).

Gate: the first 16 bits of ``md5(id)`` as a uniform draw from
[0, 65536). A row is kept when ``draw * n_group < cap * 65536`` —
integer-only arithmetic, so there is no float-rounding boundary for
engines to disagree on. md5-on-id decorrelates membership from id
assignment patterns (modulo-on-id sampling aliases with striding ids).

Zero extra shuffles beyond one tiny per-group count aggregate that
broadcasts back onto the corpus: the keep decision is a map-side
expression. At 100 TB the corpus is scanned once, filtered in place.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_gate16(id_col: Column | str) -> Column:
    """Uniform deterministic draw in [0, 65536): first 16 md5 bits of the
    stringified id. Engine-portable — md5 is md5 everywhere."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("long")


def stratified_sample(
    df: DataFrame, group_col: str, id_col: str, rates: dict[str, float]
) -> DataFrame:
    """Keep each group at its configured rate (groups absent from
    ``rates`` are kept whole). Rates quantize to 1/65536 granularity —
    the gate keeps ``draw < floor(rate * 65536)``."""
    thresh = F.lit(65536)
    for grp, rate in rates.items():
        thresh = F.when(
            F.col(group_col) == grp, F.lit(int(rate * 65536))
        ).otherwise(thresh)
    return df.filter(hash_gate16(id_col) < thresh)


def resample_weighted(
    df: DataFrame, group_col: str, id_col: str, weights: dict[str, float]
) -> DataFrame:
    """Temperature-style mixture resampling: replicate each group's rows
    by its weight — the generalization that handles UP-sampling (weight
    2.5 → every row twice, half the rows a third time) and down-sampling
    (weight 0.25) in one rule. Epoch multipliers for under-represented
    sources are exactly this operator.

    n_copies(row) = floor(w) + [gate16(id) < frac(w)·65536]; rows with
    n_copies = 0 drop out. The fractional copy uses the same md5 gate as
    the samplers, so the replica set is engine-portable, retry-stable,
    and append-stable. Output adds ``copy_id`` (1-based) so downstream
    shuffles/dedups see distinct rows, not accidental duplicates.

    Map-side only: a literal weight table folds into the plan (no join),
    the explode fans out bounded by ceil(max weight), and nothing
    shuffles. Groups absent from ``weights`` keep weight 1.0.
    """
    w_expr = F.lit(1.0)
    for grp, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {grp!r}: {w}")
        w_expr = F.when(F.col(group_col) == grp, F.lit(float(w))).otherwise(w_expr)
    whole = F.floor(w_expr).cast("long")
    frac_gate = (
        hash_gate16(id_col) < ((w_expr - F.floor(w_expr)) * 65536).cast("long")
    ).cast("long")
    n_copies = (whole + frac_gate).alias("__n_copies")
    out = df.withColumn("__n_copies", n_copies)
    # sequence(1, 0) in Spark counts DOWN ([1, 0]) — guard the empty case
    copies = F.when(
        F.col("__n_copies") >= 1, F.sequence(F.lit(1), F.col("__n_copies"))
    ).otherwise(F.array().cast("array<int>"))
    return (
        out.withColumn("copy_id", F.explode(copies))
        .drop("__n_copies")
    )


def balanced_sample(df: DataFrame, group_col: str, id_col: str) -> DataFrame:
    """Downsample every group to (approximately) the SMALLEST group's
    size — the balanced-mixture special case, with the per-group rate
    derived from the data instead of configured.

    keep ⇔ ``draw * n_group < cap * 65536`` where cap = min group count:
    exact BIGINT comparison (no float rate), deterministic everywhere.
    The min-count scalar is attached with an unpartitioned window OVER
    THE COUNTS TABLE — a table whose cardinality is the number of
    groups, so the one-reducer window is bounded and deliberate (the
    alternative, a scalar-agg cross join, re-derives the counts subtree
    — one more full pass over the corpus). The counts pass reads only
    the group column (pruned scan); the main pass is filtered map-side
    behind one broadcast, never shuffled for the gate.
    """
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    counts = counts.withColumn("__cap", F.min("__n").over(Window.partitionBy()))
    return (
        df.join(F.broadcast(counts), on=group_col)
        .filter(hash_gate16(id_col) * F.col("__n") < F.col("__cap") * F.lit(65536))
        .drop("__n", "__cap")
    )
