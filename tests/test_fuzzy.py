"""Skew-bounded fuzzy matching (`operators/fuzzy.py`).

The adversarial distribution for first-char blocking is "every name
starts with the same letter at the same length" — one block holds the
whole table. These tests build exactly that fixture and assert that

* the capped operator returns the SAME pairs as the uncapped / brute
  force formulations (both paths are exact), and
* the PassJoin candidate count stays far below the in-block quadratic
  pair count — the block-size bound the cap exists to provide.
"""

import pytest
from pyspark.sql import functions as F

from etl_process_spark.operators.fuzzy import (
    _lanes,
    blocked_levenshtein_pairs,
    passjoin_candidates,
)


def _skewed_names(n: int = 240) -> list[str]:
    """n distinct names, all first-char 'S', all length 12: near-dup
    families of 3 (base, 1-sub, 2-sub) plus unrelated filler."""
    names = set()
    alphabet = "abcdefghij"
    for f in range(n // 3):
        base = "S" + "".join(
            alphabet[(f * (j + 3) + j * j) % 10] for j in range(11)
        )
        one = base[:4] + ("z" if base[4] != "z" else "y") + base[5:]
        two = (
            one[:8] + ("q" if one[8] != "q" else "r") + one[9:]
        )
        names.update((base, one, two))
    return sorted(names)


def _brute_force(spark, names, max_dist=2, len_band=1):
    df = spark.createDataFrame([(s,) for s in names], "s string")
    a = df.select(F.col("s").alias("name_a"))
    b = df.select(F.col("s").alias("name_b"))
    return (
        a.join(
            b,
            (F.substring("name_a", 1, 1) == F.substring("name_b", 1, 1))
            & (F.abs(F.length("name_a") - F.length("name_b")) <= len_band)
            & (F.col("name_a") < F.col("name_b")),
        )
        .where(F.levenshtein("name_a", "name_b") <= max_dist)
        .select(
            "name_a", "name_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
        )
    )


@pytest.fixture(scope="module")
def skewed(spark):
    names = _skewed_names()
    df = spark.createDataFrame([(s,) for s in names], "name string")
    truth = sorted(
        map(tuple, _brute_force(spark, names).collect())
    )
    assert len(truth) >= len(names) // 3  # planted families matched
    return names, df, truth


def test_capped_equals_brute_force_on_skew(spark, skewed):
    names, df, truth = skewed
    # cap far below the single-block population: forces the PassJoin path
    got = blocked_levenshtein_pairs(df, "name", max_dist=2, len_band=1,
                                    block_cap=16)
    assert sorted(map(tuple, got.collect())) == truth


def test_uncapped_equals_brute_force_on_skew(spark, skewed):
    names, df, truth = skewed
    got = blocked_levenshtein_pairs(df, "name", max_dist=2, len_band=1,
                                    block_cap=None)
    assert sorted(map(tuple, got.collect())) == truth


def test_candidate_count_bounded_below_quadratic(spark, skewed):
    """The block-size bound itself: on a one-block corpus of n names,
    the chunk-signature join verifies a candidate set MUCH smaller than
    the n·(n-1)/2 pairs the quadratic path would score."""
    names, df, truth = skewed
    lanes = _lanes(
        df.select(F.col("name").alias("s")).distinct(), len_band=1
    )
    n = len(names)
    n_cand = passjoin_candidates(lanes, len_band=1, max_dist=2).count()
    quadratic_pairs = n * (n - 1) // 2
    assert n_cand >= len(truth)  # exact recall: every true pair surfaces
    assert n_cand < quadratic_pairs * 0.15  # the whole point of the cap
    # and the lane population really was oversized for the cap used above
    biggest = (
        lanes.groupBy("c", "K").count().agg(F.max("count")).collect()[0][0]
    )
    assert biggest > 16


def test_mixed_lengths_and_short_strings(spark):
    """Short strings (< 2·(max_dist+1) chars) can't chunk informatively
    and route through the bounded mixed path; boundary pairs between
    short and long strings must still surface."""
    names = [
        "Sab", "Sac", "Sabc",          # short family (len 3/4)
        "Sabcd", "Sabce",              # len-5 family: dist 1
        "Sabcdefg", "Sabcdefh",        # len-8 family (>= chunk min)
        "Sabcdefgh",                   # len 9: pairs with len 8 at dist 1/2
        "Txyzw",                       # different first char: never pairs
    ]
    df = spark.createDataFrame([(s,) for s in names], "name string")
    truth = sorted(map(tuple, _brute_force(spark, names).collect()))
    got = blocked_levenshtein_pairs(df, "name", max_dist=2, len_band=1,
                                    block_cap=2)
    assert sorted(map(tuple, got.collect())) == truth
    assert all(a[0] == "S" and b[0] == "S" for a, b, _ in truth)


def test_len_band_wider_than_max_dist_rejected(spark):
    df = spark.createDataFrame([("Sa",)], "name string")
    with pytest.raises(ValueError):
        blocked_levenshtein_pairs(df, "name", max_dist=1, len_band=2)
