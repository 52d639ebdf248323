"""Fellegi–Sunter probabilistic record linkage (JASA 1969): score
candidate record pairs by summing per-field agreement weights
log(m/u) / disagreement weights log((1-m)/(1-u)), then threshold into
match / possible / non-match — the decision layer on top of blocking
(`operators/fuzzy.py`) and transitive clustering (`operators/graph.py`).

Weights here are EXACT INTEGER centibans (100·log10 units), supplied as
configuration constants exactly like `quality_logit_score`'s fixed
logistic weights: the m/u probabilities a production linker estimates
by EM become a drop-in, while the scoring plumbing — per-field
comparators, integer accumulation, thresholds — is real and
oracle-checkable with zero float arithmetic.

Scale shape: candidate generation is the caller's blocking join (never
all-pairs); scoring is a pure per-row expression over the pair stream
(whole-stage codegen, no shuffle beyond the block join); thresholds cut
the output to plausible pairs only.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldWeight:
    """One field comparator: ``agree`` is a boolean Column over the pair
    row; weights in integer centibans (positive for agreement evidence,
    negative for disagreement evidence)."""

    name: str
    agree: Column
    w_agree: int
    w_disagree: int


def fs_score(
    pairs: DataFrame,
    fields: list[FieldWeight],
    match_at: int,
    possible_at: int,
) -> DataFrame:
    """Append ``score_cb`` (Σ centiban weights) and ``decision``
    ('match' ≥ match_at, 'possible' ≥ possible_at, else 'nonmatch').
    Pure integer arithmetic — bit-identical in any engine."""
    score = None
    for f in fields:
        term = F.when(f.agree, F.lit(f.w_agree)).otherwise(
            F.lit(f.w_disagree)
        )
        score = term if score is None else score + term
    return pairs.withColumn("score_cb", score.cast("long")).withColumn(
        "decision",
        F.when(F.col("score_cb") >= match_at, F.lit("match"))
        .when(F.col("score_cb") >= possible_at, F.lit("possible"))
        .otherwise(F.lit("nonmatch")),
    )
