"""Multimodal plumbing: schemas, Arrow batch shapes, decode determinism."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_process_spark.multimodal import (
    asset_schema,
    audio_features,
    decode_image_stats,
    resize_images,
    sample_packed_frames,
    synthesize_assets,
    synthesize_video_assets,
)
from etl_process_spark.multimodal.codecs import decode_image, iter_packed_frames

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def assets(spark):
    return synthesize_assets(spark, SF_DIR).cache()


def test_asset_schema_and_meta_consistency(spark, assets):
    # same field names/types as the declared contract (nullability may
    # differ: literal-derived columns come out non-nullable)
    want = [(f.name, f.dataType.simpleString()) for f in asset_schema().fields]
    got = [(f.name, f.dataType.simpleString()) for f in assets.schema.fields]
    assert got == want
    # ingest-time meta must equal decode-time observation for every asset
    stats = decode_image_stats(assets)
    joined = assets.select(
        "asset_id",
        F.col("meta.width").alias("mw"),
        F.col("meta.height").alias("mh"),
        F.col("meta.channels").alias("mc"),
    ).join(stats, "asset_id")
    bad = joined.filter(
        (F.col("mw") != F.col("width"))
        | (F.col("mh") != F.col("height"))
        | (F.col("mc") != F.col("channels"))
    )
    assert bad.count() == 0


def test_legacy_fallback_decoder_is_pure_md5(assets):
    # non-PNG bytes (the format-agnostic text corpus) take the documented
    # md5-derived stand-in — deterministic and oracle-recomputable
    row = assets.first()
    content = bytes(row["content"])
    h = hashlib.md5(content).hexdigest()
    d = decode_image(content)
    assert d["width"] == 16 + int(h[0:2], 16)
    assert d["height"] == 16 + int(h[2:4], 16)
    assert d["channels"] == 1 + int(h[4], 16) % 3
    assert d["luma_ppm"] == (1_000_000 * int(h[6:8], 16)) // 255


def test_decode_preserves_partitioning(spark):
    # decode is map-only: input partitioning survives and the operator
    # introduces no shuffle of its own (exchange count unchanged vs input)
    from etl_process_spark.plans import exchange_count

    fresh = synthesize_assets(spark, SF_DIR).repartition(7)
    stats = decode_image_stats(fresh)
    assert stats.rdd.getNumPartitions() == 7
    assert exchange_count(stats) == exchange_count(fresh)


def test_resize_stub_is_tagged_and_schema_stable(assets):
    # non-PNG bytes: no codec -> explicit tagged stub (real PNG resize is
    # covered in test_codecs.py and by the image_resize_luma oracle)
    out = resize_images(assets.limit(5), 32, 32)
    rows = out.collect()
    assert [f.name for f in out.schema.fields] == ["asset_id", "content", "width", "height"]
    for r in rows:
        assert r["width"] == 32 and r["height"] == 32
        assert bytes(r["content"]).startswith(b"FAKERESIZE:32x32:")


def test_audio_features_match_numpy(assets):
    import numpy as np

    sample = assets.limit(3).collect()
    got = {r["asset_id"]: r for r in audio_features(assets.limit(3)).collect()}
    for row in sample:
        content = bytes(row["content"])
        arr = np.frombuffer(content, dtype=np.uint8).astype("float64") - 128.0
        g = got[row["asset_id"]]
        assert g["n_samples"] == len(content)
        import math

        assert g["rms_e6"] == math.floor(
            float(np.sqrt((arr**2).mean())) * 1000000.0
        )
        assert g["mean_amp_ppm"] == (
            1000000 * int(np.abs(arr).sum())
        ) // len(content)


def test_frame_sampling_fanout(spark):
    vids = synthesize_video_assets(spark, SF_DIR)
    row = vids.orderBy(F.col("meta.n_bytes").desc()).first()
    content = bytes(row["content"])
    expected = list(iter_packed_frames(content, every_n=2))
    one = sample_packed_frames(
        vids.filter(F.col("asset_id") == row["asset_id"]), every_n=2
    )
    got = sorted(one.collect(), key=lambda r: r["frame_idx"])
    assert [(r["frame_idx"], bytes(r["frame_bytes"])) for r in got] == expected
    n_frames = 2 + int(row["asset_id"]) % 3
    assert len(got) == len(range(0, n_frames, 2))


def test_audio_corpus_ascii_contract(spark):
    """The audio oracles rebuild the sample stream per-CHARACTER with
    ascii(substr(...)), which equals the utf-8 BYTE stream only for
    ASCII text. Pin the corpus invariant (round-5 advice) and that the
    synthesizer fails LOUDLY on a violation instead of diverging."""
    from etl_process_spark.multimodal.assets import _require_ascii

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_bad = docs.filter(
        F.length(F.col("text")) != F.length(F.encode(F.col("text"), "UTF-8"))
    ).count()
    assert n_bad == 0
    assert _require_ascii(1, "plain ascii text") == "plain ascii text"
    assert _require_ascii(1, None) == ""
    with pytest.raises(ValueError, match="non-ASCII"):
        _require_ascii(7, "café")


# ---- real pHash math (round 4): pixel-level properties, no codec needed ----

def _ham(h1: str, h2: str) -> int:
    return bin(int(h1, 16) ^ int(h2, 16)).count("1")


def test_phash_pixels_contract_and_determinism():
    import numpy as np

    from etl_process_spark.multimodal.codecs import phash_from_pixels

    rng = np.random.default_rng(42)
    g = rng.uniform(0, 255, size=(48, 64))
    h1, h2 = phash_from_pixels(g), phash_from_pixels(g.copy())
    assert h1 == h2 and len(h1) == 16
    int(h1, 16)  # valid hex


def test_phash_affine_luma_invariance():
    """DC is pinned and AC coefficients scale by a > 0, so a·g + b maps
    to the IDENTICAL hash — brightness/contrast shifts are free."""
    import numpy as np

    from etl_process_spark.multimodal.codecs import phash_from_pixels

    rng = np.random.default_rng(7)
    g = rng.uniform(0, 255, size=(40, 40))
    assert phash_from_pixels(g) == phash_from_pixels(1.5 * g + 10.0)


def test_phash_near_duplicate_small_hamming():
    import numpy as np

    from etl_process_spark.multimodal.codecs import phash_from_pixels

    rng = np.random.default_rng(3)
    g = rng.uniform(0, 255, size=(64, 64))
    noisy = g + rng.normal(0, 2.0, size=g.shape)
    assert _ham(phash_from_pixels(g), phash_from_pixels(noisy)) <= 10


def test_phash_distinct_images_far_apart():
    import numpy as np

    from etl_process_spark.multimodal.codecs import phash_from_pixels

    rng = np.random.default_rng(11)
    a = rng.uniform(0, 255, size=(64, 64))
    b = rng.uniform(0, 255, size=(64, 64))
    assert _ham(phash_from_pixels(a), phash_from_pixels(b)) >= 16


def test_phash_pixel_doubling_exact():
    """Mean-pooling a 2x pixel-doubled image reproduces the original
    32x32 plane exactly, so the hash is bit-identical — the resize rule
    is a real contract, not an approximation."""
    import numpy as np

    from etl_process_spark.multimodal.codecs import phash_from_pixels

    rng = np.random.default_rng(5)
    g = rng.uniform(0, 255, size=(32, 32))
    doubled = np.kron(g, np.ones((2, 2)))
    assert phash_from_pixels(g) == phash_from_pixels(doubled)


# ---- real audio-fingerprint math (round 4): sample-level properties ----

def _tone(freq, n=8192, sr=16000, amp=1.0):
    import numpy as np

    t = np.arange(n) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def test_audio_fingerprint_deterministic_and_shaped():
    from etl_process_spark.multimodal.codecs import audio_fingerprint_from_samples

    s = _tone(440.0)
    f1 = audio_fingerprint_from_samples(s)
    f2 = audio_fingerprint_from_samples(s.copy())
    assert f1 == f2 and len(f1) > 4
    assert all(0 <= w < 2 ** 32 for w in f1)


def test_audio_fingerprint_amplitude_invariance():
    """Every band energy scales by a² under a·x, so no difference sign
    flips — gain changes are free, exactly like pHash's luma pin."""
    from etl_process_spark.multimodal.codecs import audio_fingerprint_from_samples

    s = _tone(440.0)
    assert audio_fingerprint_from_samples(s) == audio_fingerprint_from_samples(3.7 * s)


def test_audio_fingerprint_distinct_tones_differ():
    import numpy as np

    from etl_process_spark.multimodal.codecs import audio_fingerprint_from_samples

    a = audio_fingerprint_from_samples(_tone(440.0))
    b = audio_fingerprint_from_samples(_tone(1760.0))
    ham = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
    assert ham > 8 * len(a) / 4  # many bits differ across the stream


def _broadband(n=8192, sr=16000):
    """Amplitude-modulated multi-tone: energy in MANY bands with strong
    temporal structure — the kind of signal the difference-of-differences
    scheme is designed for (a pure tone leaves most bands near zero
    energy, where signs are meaninglessly noise-fragile)."""
    import numpy as np

    t = np.arange(n) / sr
    s = np.zeros(n)
    f = 110.0
    k = 1
    while f < sr / 2.2:
        am = 1.0 + 0.8 * np.sin(2 * np.pi * (1.5 + 0.7 * k) * t + 0.3 * k)
        s += am * np.sin(2 * np.pi * f * t + 0.11 * k) / np.sqrt(k)
        f *= 1.3
        k += 1
    return s


def test_audio_fingerprint_noise_robustness():
    import numpy as np

    from etl_process_spark.multimodal.codecs import audio_fingerprint_from_samples

    rng = np.random.default_rng(9)
    s = _broadband()
    noisy = s + rng.normal(0, 0.003, size=s.shape)
    a = audio_fingerprint_from_samples(s)
    b = audio_fingerprint_from_samples(noisy)
    ham = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
    assert ham < 0.1 * 32 * len(a), (ham, 32 * len(a))
