"""Blocked fuzzy string matching with skew-bounded blocks.

The naive fuzzy join blocks on (first character, length band) and does
quadratic work inside each block (`queries/analytics.py::
similar_part_names`, reference surface: the `report.py`-style join at
scale). That is fine when block sizes are balanced, but real-world name
distributions skew hard — on a corpus where every product starts with
"S", one block holds the whole table and the "blocked" join degenerates
to all-pairs on a single shuffle key.

This module keeps the same exact output contract (all pairs within
``len_band`` length difference and Levenshtein distance ≤ ``max_dist``,
sharing a first character) while bounding per-key quadratic work:

* Every name is lane-emitted under meeting keys ``(first_char, K)`` for
  ``K ∈ [length, length + len_band]``; a pair (a, b) meets exactly once,
  at ``K = greatest(len(a), len(b))``. Length is therefore part of the
  SHUFFLE key (the naive formulation shuffles on first char alone and
  leaves the length band as a residual — one hot character = one hot
  partition).
* Keys whose lane population is ≤ ``block_cap`` run the in-block
  quadratic join — cheap and exact for balanced blocks.
* Oversized keys switch to a PassJoin-style chunk signature join
  (Li, Deng, Feng: "PASS-JOIN: A Partition-based Method for Similarity
  Joins", PVLDB 2011): split every string into ``max_dist + 1``
  contiguous chunks; if ``ed(a, b) ≤ max_dist`` then at least one chunk
  of ``a`` occurs VERBATIM in ``b`` at a start position shifted by at
  most ``max_dist`` (pigeonhole: k edits can break at most k chunks).
  Candidates are an equi join on (key, chunk index, chunk text,
  partner length) — per-string fan-out is O(max_dist²) keys, never the
  block population — then a single Levenshtein verify. Exact recall,
  no sampling, no truncation.
* Strings too short to split into ``max_dist + 1`` non-empty chunks
  (length < ``2 * (max_dist + 1)``) stay on the quadratic path even in
  oversized keys: a zero-length chunk would match everything anyway.
  Within a ``len_band ≤ max_dist`` block, short and long strings can
  still pair — the short-lane × long-lane boundary pairs are covered by
  a dedicated mixed join (short side is population-bounded by
  construction: there are at most ``2*(max_dist+1)+len_band`` distinct
  short lengths per character).

At 100 TB: the lane count per key is data-dependent, but the PassJoin
path's shuffle rows per string are a constant (≤ (k+1)·(band+1)·(2k+1)
probe keys + (k+1) signature keys, k = max_dist), so an adversarial
block of N identical-prefix strings costs O(N · k²) shuffle +
candidate-verify work instead of O(N²). Candidate count still reflects
true near-duplicate density (the output itself can be quadratic if
everything matches everything — that is the answer, not a failure).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _lanes(names: DataFrame, len_band: int) -> DataFrame:
    """names(s) → (s, c, L, K) emitted once per meeting key K."""
    return (
        names.select(
            "s",
            F.substring("s", 1, 1).alias("c"),
            F.length("s").alias("L"),
        )
        .select(
            "s", "c", "L",
            F.explode(
                F.sequence(F.col("L"), F.col("L") + F.lit(len_band))
            ).alias("K"),
        )
    )


def _pair_cols(a: str = "name_a", b: str = "name_b") -> list[Column]:
    return [
        F.col("sa").alias(a),
        F.col("sb").alias(b),
        F.levenshtein("sa", "sb").cast("int").alias("dist"),
    ]


def _quadratic(lanes: DataFrame, len_band: int, max_dist: int) -> DataFrame:
    """Exact in-block pair join; each pair meets at one (c, K) only."""
    a = lanes.select(
        F.col("s").alias("sa"), F.col("L").alias("la"), "c", "K"
    )
    b = lanes.select(
        F.col("s").alias("sb"), F.col("L").alias("lb"), "c", "K"
    )
    return (
        a.join(b, ["c", "K"])
        .where(
            (F.col("sa") < F.col("sb"))
            & (F.abs(F.col("la") - F.col("lb")) <= len_band)
            & (F.col("K") == F.greatest("la", "lb"))
        )
        .where(F.levenshtein("sa", "sb") <= max_dist)
        .select(*_pair_cols())
    )


def _chunk_signatures(lanes: DataFrame, max_dist: int) -> DataFrame:
    """(c, K, i, chunk text, own length L, s) — the indexed side.

    Chunk i of a length-L string covers [floor(i·L/(k+1)),
    floor((i+1)·L/(k+1))) (0-based), k = max_dist.
    """
    k1 = max_dist + 1
    return lanes.select(
        "c", "K", "L", "s",
        F.explode(
            F.expr(
                f"transform(sequence(0, {max_dist}), i -> struct("
                f"  i AS i,"
                f"  substring(s, CAST(floor(i * L / {k1}) AS INT) + 1,"
                f"    CAST(floor((i + 1) * L / {k1}) AS INT)"
                f"      - CAST(floor(i * L / {k1}) AS INT)) AS txt))"
            )
        ).alias("ch"),
    ).select("c", "K", "L", "s", F.col("ch.i").alias("i"), F.col("ch.txt").alias("txt"))


def _probe_substrings(
    lanes: DataFrame, len_band: int, max_dist: int
) -> DataFrame:
    """(c, K, partner length Lp, i, substring, s) — the probing side.

    For each potential partner length Lp in the key's band and each
    chunk index i, emit every substring of s whose start is within
    ±max_dist of partner-chunk i's start and whose length equals
    partner-chunk i's length. The PassJoin theorem guarantees a match
    for any true pair.
    """
    k1 = max_dist + 1
    lo, hi = -len_band, 0  # partner lengths: K-len_band .. K
    return lanes.select(
        "c", "K", "L", "s",
        F.explode(
            F.expr(
                # (Lp, i, d) triples, filtered to in-range substrings
                f"""
                filter(
                  flatten(flatten(
                    transform(sequence(K + {lo}, K + {hi}), Lp ->
                      transform(sequence(0, {max_dist}), i ->
                        transform(sequence(-{max_dist}, {max_dist}), d ->
                          struct(
                            Lp AS lp, i AS i,
                            CAST(floor(i * Lp / {k1}) AS INT) + d AS p,
                            CAST(floor((i + 1) * Lp / {k1}) AS INT)
                              - CAST(floor(i * Lp / {k1}) AS INT) AS ln
                          ))))
                  )),
                  t -> t.p >= 0 AND t.ln > 0 AND t.p + t.ln <= L
                )
                """
            )
        ).alias("pr"),
    ).select(
        "c", "K", "L", "s",
        F.col("pr.lp").alias("lp"),
        F.col("pr.i").alias("i"),
        F.expr("substring(s, pr.p + 1, pr.ln)").alias("txt"),
    )


def passjoin_candidates(
    lanes: DataFrame, len_band: int, max_dist: int
) -> DataFrame:
    """Distinct candidate pairs (sa < sb, with lengths) from the chunk
    signature join — exposed separately so tests can assert the
    candidate count stays far below the in-block quadratic count."""
    sig = _chunk_signatures(lanes, max_dist)
    prb = _probe_substrings(lanes, len_band, max_dist)
    cand = (
        sig.select(
            "c", "K", "i", "txt",
            F.col("L").alias("l_sig"), F.col("s").alias("s_sig"),
        )
        .join(
            prb.select(
                "c", "K", "i", "txt", "lp",
                F.col("L").alias("l_prb"), F.col("s").alias("s_prb"),
            ),
            ["c", "K", "i", "txt"],
        )
        # probe enumerated the signature's exact length
        .where(F.col("lp") == F.col("l_sig"))
        # a pair meets at exactly one key
        .where(F.col("K") == F.greatest("l_sig", "l_prb"))
        .where(F.abs(F.col("l_sig") - F.col("l_prb")) <= len_band)
        .where(F.col("s_sig") != F.col("s_prb"))
        .select(
            F.least("s_sig", "s_prb").alias("sa"),
            F.greatest("s_sig", "s_prb").alias("sb"),
        )
        .distinct()
    )
    return cand


def blocked_levenshtein_pairs(
    df: DataFrame,
    col: str,
    max_dist: int = 2,
    len_band: int = 1,
    block_cap: int | None = None,
) -> DataFrame:
    """All distinct-value pairs (name_a < name_b) sharing a first
    character, within ``len_band`` length difference, and within
    Levenshtein distance ``max_dist`` — without all-pairs comparison,
    and (with ``block_cap``) without unbounded per-block quadratics.

    ``block_cap=None`` reproduces the plain blocked join. With a cap,
    meeting keys whose lane population exceeds it are answered by the
    exact PassJoin chunk-signature join instead; output is identical
    either way (both paths are exact), only the plan changes.

    ``len_band`` must be ≤ ``max_dist`` (a wider band would admit pairs
    the chunk pigeonhole doesn't cover).
    """
    if len_band > max_dist:
        raise ValueError("len_band must be <= max_dist for exact recall")
    names = df.select(F.col(col).alias("s")).where(F.col("s").isNotNull()).distinct()
    lanes = _lanes(names, len_band)
    if block_cap is None:
        return _quadratic(lanes, len_band, max_dist)

    # population per meeting key (tiny aggregate: one row per (c, K))
    pop = lanes.groupBy("c", "K").agg(F.count(F.lit(1)).alias("n"))
    big_keys = pop.where(F.col("n") > block_cap).select("c", "K")
    small = lanes.join(F.broadcast(big_keys), ["c", "K"], "left_anti")
    big = lanes.join(F.broadcast(big_keys), ["c", "K"], "left_semi")

    # strings too short for (max_dist+1) informative chunks stay
    # quadratic even inside oversized keys; their lane population per
    # key is bounded by the short-length cutoff itself, and mixed
    # short×long pairs are covered because BOTH lanes of such a pair
    # carry the short string (the long partner probes the short lanes).
    min_len = 2 * (max_dist + 1)
    big_short = big.where(F.col("L") < min_len)
    big_long = big.where(F.col("L") >= min_len)

    verified_big = (
        passjoin_candidates(big_long, len_band, max_dist)
        .where(F.levenshtein("sa", "sb") <= max_dist)
        .select(*_pair_cols())
    )
    # short×short and short×long inside oversized keys: quadratic on the
    # short side joined against ALL lanes of the key (short side is the
    # outer loop; its population per key is small by construction).
    mixed = (
        big_short.select(F.col("s").alias("sa"), F.col("L").alias("la"), "c", "K")
        .join(
            big.select(F.col("s").alias("sb"), F.col("L").alias("lb"), "c", "K"),
            ["c", "K"],
        )
        .where(
            (F.col("sa") != F.col("sb"))
            & (F.abs(F.col("la") - F.col("lb")) <= len_band)
            & (F.col("K") == F.greatest("la", "lb"))
        )
        .select(
            F.least("sa", "sb").alias("sa"),
            F.greatest("sa", "sb").alias("sb"),
        )
        .distinct()
        .where(F.levenshtein("sa", "sb") <= max_dist)
        .select(*_pair_cols())
    )
    return _quadratic(small, len_band, max_dist).unionByName(
        verified_big
    ).unionByName(mixed).distinct()
