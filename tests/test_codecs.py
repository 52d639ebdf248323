"""Real stdlib codecs (round 5): PNG (zlib + scanline filters), WAV
(stdlib wave), packed-PNG video container — round-trips, hand-computed
fixtures, and the corpus-takes-the-real-path pins that make the round-4
md5 stand-in dead code for the synthetic media corpus.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_process_spark.multimodal.codecs import (
    decode_audio,
    decode_image,
    iter_packed_frames,
    pack_frames,
    perceptual_hash,
    phash_from_pixels,
    resize_image,
)
from etl_process_spark.multimodal.pngcodec import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
)
from etl_process_spark.multimodal.wavcodec import (
    decode_wav,
    encode_wav,
    is_wav,
    wav_header_meta,
)


# ---------------------------- PNG ----------------------------------------

def test_png_roundtrip_every_filter_and_size():
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (2, 3), (7, 5), (33, 64), (96, 41)]:
        px = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        for ft in [0, 1, 2, 3, 4, "cycle"]:
            ww, hh, c, out = decode_png(encode_png(px, filter_type=ft))
            assert (ww, hh, c) == (w, h, 1)
            assert np.array_equal(out, px), (h, w, ft)


def test_png_roundtrip_rgb():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(17, 9, 3), dtype=np.uint8)
    w, h, c, out = decode_png(encode_png(px))
    assert (w, h, c) == (9, 17, 3)
    assert np.array_equal(out, px)


def test_png_decode_hand_built_fixture():
    """Decode a PNG assembled BY HAND (struct + zlib, no encoder help):
    2×3 grayscale, row 0 with filter 0 (None), row 1 with filter 2 (Up)
    — filtered bytes computed on paper: up-filter stores x − above
    mod 256."""
    pixels = np.array([[10, 200, 30], [250, 100, 7]], dtype=np.uint8)
    row0 = bytes([0, 10, 200, 30])                      # filter None
    row1 = bytes([2, (250 - 10) % 256, (100 - 200) % 256, (7 - 30) % 256])
    raw = row0 + row1

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    data = (
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, c, out = decode_png(data)
    assert (w, h, c) == (3, 2, 1)
    assert np.array_equal(out, pixels)


def test_png_decode_rejects_corruption_and_bad_profiles():
    px = np.zeros((4, 4), dtype=np.uint8)
    good = encode_png(px)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + good)
    flipped = bytearray(good)
    flipped[40] ^= 0xFF  # inside IDAT payload -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(flipped))
    # 16-bit depth is outside the supported profile: must refuse loudly
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    bad = PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bad)


def test_decode_image_real_png_exact_stats():
    """width/height from IHDR; luma_ppm = floor(1e6·Σ/(255·n)) — checked
    against integers computed by hand."""
    px = np.array([[0, 255], [128, 64], [32, 16]], dtype=np.uint8)
    d = decode_image(encode_png(px))
    assert (d["width"], d["height"], d["channels"]) == (2, 3, 1)
    assert d["luma_ppm"] == (1_000_000 * (0 + 255 + 128 + 64 + 32 + 16)) // (255 * 6)


def test_decode_image_rgb_uses_integer_itu_luma():
    px = np.zeros((1, 2, 3), dtype=np.uint8)
    px[0, 0] = [255, 0, 0]   # luma (299*255)//1000 = 76
    px[0, 1] = [0, 255, 0]   # luma (587*255)//1000 = 149
    d = decode_image(encode_png(px))
    assert d["channels"] == 3
    assert d["luma_ppm"] == (1_000_000 * (76 + 149)) // (255 * 2)


def test_resize_image_real_png_mean_pool_half_up():
    """2×2 → 1×1: the single output pixel is floor(mean + 0.5)."""
    px = np.array([[10, 11], [12, 14]], dtype=np.uint8)  # mean 11.75 -> 12
    out = resize_image(encode_png(px), 1, 1)
    w, h, c, dec = decode_png(out)
    assert (w, h, c) == (1, 1, 1)
    assert dec[0, 0] == 12
    px2 = np.array([[10, 11], [12, 13]], dtype=np.uint8)  # mean 11.5 -> 12 (half-up)
    _, _, _, dec2 = decode_png(resize_image(encode_png(px2), 1, 1))
    assert dec2[0, 0] == 12


def test_perceptual_hash_png_is_real_phash():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(40, 56), dtype=np.uint8)
    assert perceptual_hash(encode_png(px)) == phash_from_pixels(
        px.astype(np.float64)
    )


# ---------------------------- WAV ----------------------------------------

def test_wav_roundtrip_and_header_meta():
    rng = np.random.RandomState(11)
    samples = rng.randint(-32768, 32768, size=777).astype(np.int16)
    wav = encode_wav(samples, rate=8000)
    assert is_wav(wav)
    dec, rate = decode_wav(wav)
    assert rate == 8000
    assert np.array_equal(dec, samples.astype(np.int64))
    assert wav_header_meta(wav) == (777, 8000, 2)


def test_wav_8bit_recentered():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(4000)
        w.writeframes(bytes([0, 128, 255]))
    dec, rate = decode_wav(buf.getvalue())
    assert rate == 4000
    assert dec.tolist() == [-128, 0, 127]


def test_wav_rejects_unsupported_profiles():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(buf.getvalue())


def test_decode_audio_wav_exact_features():
    samples = np.array([-128, 0, 127, 50], dtype=np.int16)
    d = decode_audio(encode_wav(samples))
    assert d["n_samples"] == 4
    assert d["mean_amp_ppm"] == (1_000_000 * (128 + 0 + 127 + 50)) // 4
    import math

    sq = 128 * 128 + 0 + 127 * 127 + 50 * 50
    assert d["rms_e6"] == math.floor(math.sqrt(sq / 4) * 1_000_000.0)


# ------------------------ packed-frame container --------------------------

def test_packed_frames_roundtrip_and_sampling():
    frames = [b"alpha", b"", b"gamma-gamma", b"d"]
    packed = pack_frames(frames)
    assert [(i, f) for i, f in iter_packed_frames(packed)] == list(
        enumerate(frames)
    )
    assert [(i, f) for i, f in iter_packed_frames(packed, every_n=2)] == [
        (0, b"alpha"), (2, b"gamma-gamma")
    ]
    with pytest.raises(ValueError, match="truncated"):
        list(iter_packed_frames(packed[:-1]))
    # 1-3 trailing bytes after the last complete frame can't be a length
    # prefix: must be reported as corruption, not silently ignored
    # (round-5 advice)
    with pytest.raises(ValueError, match="trailing"):
        list(iter_packed_frames(packed + b"\x00\x01"))


# -------------------- the corpus takes the REAL path ----------------------

def test_image_corpus_is_real_png_and_standin_dead(spark):
    """Every synthesized image asset is an actual PNG; its decode equals
    its ingest meta; and its perceptual hash is the DCT hash of its own
    decoded pixels — NOT the md5 stand-in. The fallback branch is dead
    code for the corpus."""
    import hashlib

    from etl_process_spark.multimodal.assets import (
        doc_image_pixels,
        synthesize_image_assets,
    )

    rows = synthesize_image_assets(spark, "/root/testdata/sf0.001").limit(
        8
    ).collect()
    assert rows
    for r in rows:
        content = bytes(r["content"])
        assert content[:8] == PNG_SIGNATURE
        d = decode_image(content)
        assert d["width"] == r["meta"]["width"]
        assert d["height"] == r["meta"]["height"]
        px = doc_image_pixels(int(r["asset_id"]))
        _, _, _, dec = decode_png(content)
        assert np.array_equal(dec, px)  # decode == synthesis rule, exactly
        ph = perceptual_hash(content)
        assert ph == phash_from_pixels(px.astype(np.float64))
        assert ph != hashlib.md5(content).hexdigest()[:16]


def test_affine_twin_pairs_byte_different_hash_identical():
    """The odd doc's image is the even base under 2·g + 1: different
    bytes, different luma, IDENTICAL pHash — the perceptual ground
    truth image_phash_dup_pairs must recover."""
    from etl_process_spark.multimodal.assets import doc_image_pixels
    from etl_process_spark.multimodal.pngcodec import encode_png

    for gid in (0, 2, 14, 36):
        base, twin = doc_image_pixels(gid), doc_image_pixels(gid + 1)
        assert not np.array_equal(base, twin)
        assert np.array_equal(twin, 2 * base.astype(np.int64) + 1)
        assert encode_png(base) != encode_png(twin)
        assert phash_from_pixels(
            base.astype(np.float64)
        ) == phash_from_pixels(twin.astype(np.float64))
        # and the decode-level luma genuinely differs (brightness shift)
        assert decode_image(encode_png(base))["luma_ppm"] != decode_image(
            encode_png(twin)
        )["luma_ppm"]


def test_audio_corpus_is_real_wav(spark):
    from etl_process_spark.multimodal.assets import synthesize_audio_assets

    rows = synthesize_audio_assets(spark, "/root/testdata/sf0.001").limit(
        4
    ).collect()
    assert rows
    for r in rows:
        content = bytes(r["content"])
        assert is_wav(content)
        n, rate, width = wav_header_meta(content)
        assert (rate, width) == (8000, 2)
        assert n == r["meta"]["width"]  # meta carries n_samples


def test_video_corpus_frames_are_real_pngs(spark):
    from etl_process_spark.multimodal.assets import (
        frame_pixels,
        synthesize_video_assets,
    )

    rows = synthesize_video_assets(spark, "/root/testdata/sf0.001").limit(
        3
    ).collect()
    assert rows
    for r in rows:
        content = bytes(r["content"])
        frames = list(iter_packed_frames(content))
        assert len(frames) == 2 + int(r["asset_id"]) % 3
        for idx, fb in frames:
            assert fb[:8] == PNG_SIGNATURE
            _, _, _, dec = decode_png(fb)
            assert np.array_equal(dec, frame_pixels(int(r["asset_id"]), idx))


def test_band_edges_shared_contract():
    """The SQL oracle embeds band_edges() output as literals — pin the
    frame=128/33-band grid the wav_fingerprint_words query uses: 34
    strictly increasing integer edges from 1 to 64 (the linear fallback,
    since the log grid collapses at this frame size)."""
    from etl_process_spark.multimodal.codecs import band_edges

    e = band_edges(128, 33)
    assert len(e) == 34 and e[0] == 1 and e[-1] == 64
    assert all(int(b) > int(a) for a, b in zip(e, e[1:]))
    # frames too small for even the linear grid fail loudly instead of
    # emitting degenerate reduceat buckets (round-5 advice)
    with pytest.raises(ValueError, match="non-monotone"):
        band_edges(64, 33)
    # larger frames (log grid survives) also come back strictly increasing
    e2 = band_edges(1024, 33)
    assert len(e2) == 34
    assert all(int(b) > int(a) for a, b in zip(e2, e2[1:]))


def test_audio_fingerprint_wav_equals_samples_path():
    """Container-level fingerprint == sample-level fingerprint of the
    same PCM data (WAV decode is lossless)."""
    import numpy as np

    from etl_process_spark.multimodal.codecs import (
        audio_fingerprint,
        audio_fingerprint_from_samples,
    )

    rng = np.random.RandomState(23)
    samples = rng.randint(-2000, 2000, size=700).astype(np.int16)
    via_wav = audio_fingerprint(
        encode_wav(samples), frame=128, hop=128, n_bands=33
    )
    direct = audio_fingerprint_from_samples(
        samples.astype(np.float64), frame=128, hop=128, n_bands=33
    )
    # n_frames = 1 + (700 - 128) // 128 = 5 -> 4 difference words
    assert via_wav == direct and len(via_wav) == 4


def test_rgb_corpus_is_real_color_png(spark):
    from etl_process_spark.multimodal.assets import (
        rgb_image_pixels,
        synthesize_rgb_image_assets,
    )

    rows = synthesize_rgb_image_assets(spark, "/root/testdata/sf0.001").limit(
        4
    ).collect()
    assert rows
    for r in rows:
        content = bytes(r["content"])
        assert content[:8] == PNG_SIGNATURE
        w, h, c, px = decode_png(content)
        assert c == 3
        assert (w, h) == (r["meta"]["width"], r["meta"]["height"])
        assert np.array_equal(px, rgb_image_pixels(int(r["asset_id"])))


def test_shifted_twins_need_offset_vote_matcher(spark):
    """The round-6 ground truth: hop-shifted amplitude twins score ZERO
    on the aligned (word_idx, word) matcher and are recovered by the
    offset-vote matcher — the property that makes the offset matcher a
    real operator, not a re-labeling of the aligned one."""
    from pyspark.sql import functions as F

    from etl_process_spark.multimodal.assets import (
        synthesize_paired_audio_assets,
        twin_shift_hops,
    )
    from etl_process_spark.multimodal.ops import audio_fingerprint_words
    from etl_process_spark.queries.media import (
        _FP_FRAME,
        _FP_MAX_SHIFT,
        _FP_NBANDS,
        _FP_OHOP,
    )

    sf = "/root/testdata/sf0.01"
    words = audio_fingerprint_words(
        synthesize_paired_audio_assets(
            spark, sf, max_shift_hops=_FP_MAX_SHIFT, hop=_FP_OHOP
        ),
        frame=_FP_FRAME, hop=_FP_OHOP, n_bands=_FP_NBANDS,
    ).cache()
    try:
        # the aligned matcher (wav_fingerprint_dup_pairs' join) on the
        # SHIFTED corpus: no twin pair may clear the >=3 fence
        a, b = words.alias("a"), words.alias("b")
        aligned = (
            a.join(
                b,
                (F.col("a.word_idx") == F.col("b.word_idx"))
                & (F.col("a.word") == F.col("b.word"))
                & (F.col("a.asset_id") + 1 == F.col("b.asset_id"))
                & (F.col("a.asset_id") % 2 == 0),
            )
            .groupBy(F.col("a.asset_id").alias("asset_a"))
            .agg(F.count(F.lit(1)).alias("n_common"))
            .filter(F.col("n_common") >= 3)
        )
        assert aligned.count() == 0
        # the offset-vote matcher recovers the twins, each at the exact
        # synthesized shift
        from etl_process_spark.queries import QUERIES

        rows = QUERIES["wav_fingerprint_offset_pairs"].builder(
            spark, sf
        ).collect()
        twins = [
            r for r in rows
            if r.asset_a % 2 == 0 and r.asset_b == r.asset_a + 1
        ]
        assert len(twins) >= 50
        for r in twins:
            assert r.best_offset == twin_shift_hops(r.asset_a, _FP_MAX_SHIFT)
    finally:
        words.unpersist()


def test_video_pooled_map_matches_resize():
    """The video pHash oracle embeds a 24->32 source-row map as SQL
    literals, claiming _area_resize's fill rule is pure pixel
    duplication for h < target. Pin pooled[p][q] == g[src(p)][src(q)]
    for the exact map the query generates."""
    import re

    from etl_process_spark.multimodal.codecs import _area_resize
    from etl_process_spark.queries.media import _vid_srcmap_sql

    pairs = re.findall(r"\((\d+), (\d+)\)", _vid_srcmap_sql())
    src = [int(sr) for _p, sr in sorted(pairs, key=lambda t: int(t[0]))]
    assert len(src) == 32
    rng = np.random.default_rng(17)
    for _ in range(3):
        g = rng.integers(0, 128, size=(24, 24)).astype(np.float64)
        pooled = _area_resize(g, 32, 32)
        assert np.array_equal(pooled, g[np.ix_(src, src)])


def test_paired_video_corpus_twins_are_shifted_affine(spark):
    """Paired-video ground truth: the odd twin's frame j is the exact
    affine map 2·g+1 of the base's frame j+s — byte-DIFFERENT PNGs with
    IDENTICAL per-frame pHash, displaced by s = (gid/2) % 2 frames."""
    from etl_process_spark.multimodal.assets import (
        paired_frame_pixels,
        paired_video_shape,
        synthesize_paired_video_assets,
    )

    rows = {
        int(r["asset_id"]): bytes(r["content"])
        for r in synthesize_paired_video_assets(
            spark, "/root/testdata/sf0.001"
        ).filter("asset_id < 8").collect()
    }
    assert len(rows) >= 6
    for gid in (0, 2, 4, 6):
        nf, s = paired_video_shape(gid)
        base_frames = list(iter_packed_frames(rows[gid]))
        twin_frames = list(iter_packed_frames(rows[gid + 1]))
        assert len(base_frames) == nf and len(twin_frames) == nf - s
        for (j, tw) in twin_frames:
            _bi, bs = base_frames[j + s]
            assert tw != bs  # byte-different
            _, _, _, bpx = decode_png(bs)
            _, _, _, tpx = decode_png(tw)
            assert np.array_equal(
                tpx, (2 * bpx.astype(np.int64) + 1).astype(np.uint8)
            )
            assert np.array_equal(bpx, paired_frame_pixels(gid, j + s))
            assert perceptual_hash(tw) == perceptual_hash(bs)


def test_phash_oracle_float_chain_is_materialized():
    """The pHash oracles' float chain (DCT blk -> median -> bits ->
    bands) MUST be evaluated exactly once: DuckDB inlines plain CTEs, so
    multi-referenced chains get independently re-evaluated, and with
    multi-threaded float aggregation two evaluations differ by ~1e-13 —
    enough to flip the median ELEMENT's own sign bit (margin exactly 0
    by definition; every other bit has >=1e-4 audited margin). Observed
    at sf0.1 as +-1-bit hamming noise on half the image groups before
    round 6 pinned AS MATERIALIZED on blk/bands (and on the audio word
    stream, where it is also a ~2x oracle speedup)."""
    from etl_process_spark.queries import QUERIES

    # (wav_fingerprint_words' own chain is single-reference — its final
    # SELECT is the only consumer of w — so it carries no hazard)
    for name, needed in [
        ("image_phash_dup_pairs", 2),      # blk + bands
        ("video_phash_dup_pairs", 2),      # blk + bands
        ("wav_fingerprint_dup_pairs", 1),  # w
        ("wav_fingerprint_offset_pairs", 1),
    ]:
        sql = QUERIES[name].oracle
        assert sql.count("AS MATERIALIZED") >= needed, (
            f"{name}: float-chain CTEs must stay MATERIALIZED "
            "(cross-evaluation noise flips the zero-margin median bit)"
        )


def test_offset_matcher_df_fence_bounds_hot_prefix_buckets(spark, tmp_path):
    """The document-frequency fence is the offset matcher's skew defense.
    A boilerplate PREFIX longer than the analysis frame gives every doc
    IDENTICAL fingerprint words at the pure-prefix indices — without the
    fence those words form corpus-sized buckets (quadratic candidate
    blowup). The fence drops them (df > cap) while keeping the
    low-frequency boundary/tail words, so:

    * twins are still recovered at their exact shifts (tail words carry
      the vote),
    * docs sharing only the prefix are STILL reported — correctly: 63%
      shared signal IS containment-style near-duplication — but their
      votes come from the small boundary buckets only, strictly fewer
      than any twin's, and
    * no surviving bucket exceeds the cap, which is the scale bound.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from etl_process_spark.multimodal.assets import (
        synthesize_paired_audio_assets,
        twin_shift_hops,
    )
    from etl_process_spark.multimodal.ops import audio_fingerprint_words
    from etl_process_spark.queries import QUERIES
    from etl_process_spark.queries.media import (
        _FP_DF_CAP,
        _FP_FRAME,
        _FP_MAX_SHIFT,
        _FP_NBANDS,
        _FP_OHOP,
    )

    n_groups = 40
    prefix = ("shared boilerplate header kept by the crawler " * 12)[:512]
    rows = []
    for g in range(n_groups):
        text = prefix + f"tail {g} " + (f"doc{g}x" * 60)[:300]
        rows.append({"doc_id": 2 * g, "text": text})
        rows.append({"doc_id": 2 * g + 1, "text": text})  # synth shifts odd
    sf_dir = str(tmp_path / "hotsf")
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    assert n_groups * 2 > _FP_DF_CAP  # pure-prefix words MUST trip the fence

    # the fence fires: pure-prefix words (identical across all 80 docs)
    # exceed the cap and are dropped from the join
    words = audio_fingerprint_words(
        synthesize_paired_audio_assets(
            spark, sf_dir, max_shift_hops=_FP_MAX_SHIFT, hop=_FP_OHOP
        ),
        frame=_FP_FRAME, hop=_FP_OHOP, n_bands=_FP_NBANDS,
    )
    dfreq = words.groupBy("word").agg(
        F.countDistinct("asset_id").alias("df")
    )
    assert dfreq.filter(F.col("df") > _FP_DF_CAP).count() >= 5

    out = QUERIES["wav_fingerprint_offset_pairs"].builder(
        spark, sf_dir
    ).collect()
    twins = [r for r in out if r.asset_a % 2 == 0 and r.asset_b == r.asset_a + 1]
    cross = [r for r in out if not (r.asset_a % 2 == 0 and r.asset_b == r.asset_a + 1)]
    # twins all recovered at their synthesized shifts
    assert len(twins) >= int(0.8 * n_groups)
    for r in twins:
        assert r.best_offset == twin_shift_hops(r.asset_a, _FP_MAX_SHIFT)
    # prefix-sharing cross pairs are reported (genuine partial dups) but
    # only through the sub-cap boundary buckets: rerun the matcher's
    # raw join WITHOUT the fence and check it strictly inflates every
    # cross pair's vote count (the fenced words were carrying corpus-
    # sized buckets of pure-boilerplate votes)
    if cross:
        a, b = words.alias("a"), words.alias("b")
        raw_votes = (
            a.join(
                b,
                (F.col("a.word") == F.col("b.word"))
                & (F.col("a.asset_id") < F.col("b.asset_id")),
            )
            .groupBy(
                F.col("a.asset_id").alias("asset_a"),
                F.col("b.asset_id").alias("asset_b"),
                (F.col("a.word_idx") - F.col("b.word_idx")).alias("off"),
            )
            .agg(F.count(F.lit(1)).alias("v"))
        )
        raw = {
            (r.asset_a, r.asset_b, r.off): r.v for r in raw_votes.collect()
        }
        for r in cross:
            assert raw[(r.asset_a, r.asset_b, r.best_offset)] > r.n_votes, (
                "the fence removed nothing for cross pair "
                f"({r.asset_a}, {r.asset_b})"
            )
