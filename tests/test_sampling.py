"""Deterministic sampling invariants: reproducibility, rate accuracy,
append stability — the properties that make a hash gate the right
sampler for training data (and df.sample() the wrong one)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_process_spark.operators.sampling import (
    balanced_sample,
    hash_gate16,
    stratified_sample,
)


def _docs(spark, per_lang):
    rows, i = [], 0
    for lang, n in per_lang.items():
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_gate_is_uniform_enough_and_deterministic(spark):
    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    gated = df.select(hash_gate16("doc_id").alias("g"))
    lo, hi = gated.agg(F.min("g"), F.max("g")).first()
    assert 0 <= lo and hi < 65536
    # two evaluations agree row-for-row (pure function of the id)
    a = set(r.g for r in gated.collect())
    b = set(r.g for r in df.select(hash_gate16("doc_id").alias("g")).collect())
    assert a == b
    # roughly uniform: a 25% slice keeps 25% +/- 2pp at n=20k
    kept = gated.filter(F.col("g") < 16384).count()
    assert abs(kept / 20_000 - 0.25) < 0.02


def test_stratified_rates_hit_targets(spark):
    df = _docs(spark, {"en": 8000, "de": 4000, "fr": 1000})
    out = stratified_sample(df, "lang", "doc_id", {"en": 0.125, "de": 0.5})
    got = {r["lang"]: r["cnt"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert abs(got["en"] / 8000 - 0.125) < 0.03
    assert abs(got["de"] / 4000 - 0.5) < 0.03
    assert got["fr"] == 1000  # unconfigured group kept whole


def test_balanced_sample_levels_groups(spark):
    df = _docs(spark, {"en": 10_000, "de": 2500, "fr": 500})
    out = balanced_sample(df, "lang", "doc_id")
    got = {r["lang"]: r["cnt"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # smallest group survives whole; the others land near cap=500
    assert got["fr"] == 500
    for lang in ("en", "de"):
        assert abs(got[lang] - 500) < 500 * 0.35, got


def test_membership_is_append_stable(spark):
    """Growing the corpus must not flip any already-kept row of a group
    whose rate is unchanged (configured-rate sampling)."""
    small = _docs(spark, {"en": 2000})
    big = _docs(spark, {"en": 4000})  # superset ids 0..3999
    rates = {"en": 0.25}
    kept_small = {r.doc_id for r in
                  stratified_sample(small, "lang", "doc_id", rates).collect()}
    kept_big = {r.doc_id for r in
                stratified_sample(big, "lang", "doc_id", rates).collect()}
    assert kept_small <= kept_big


def test_resample_weighted_copy_counts(spark):
    from etl_process_spark.operators.sampling import resample_weighted

    df = _docs(spark, {"en": 4000, "de": 4000, "fr": 1000})
    out = resample_weighted(df, "lang", "doc_id", {"en": 0.5, "de": 2.25})
    got = {r["lang"]: r["cnt"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert abs(got["en"] / 4000 - 0.5) < 0.03          # downsample
    assert abs(got["de"] / 4000 - 2.25) < 0.03         # upsample
    assert got["fr"] == 1000                            # untouched
    # every de row appears at least twice (whole part of the weight)
    de_min = (out.filter(F.col("lang") == "de").groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("c"))
              .agg(F.min("c")).first()[0])
    assert de_min == 2
    # copy_id makes replicas distinct rows
    assert out.distinct().count() == out.count()


def test_resample_weight_zero_drops_group(spark):
    from etl_process_spark.operators.sampling import resample_weighted

    df = _docs(spark, {"en": 100, "fr": 50})
    out = resample_weighted(df, "lang", "doc_id", {"en": 0.0})
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"fr"}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        resample_weighted(df, "lang", "doc_id", {"en": -1.0})
