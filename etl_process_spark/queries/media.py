"""Multimodal-column queries (binary assets + mapInPandas decode path).

The asset corpus is synthesized deterministically from ``documents``
(assets.py), and the stand-in decoder is a pure function of the bytes'
md5 (codecs.py) — so even the Python-side mapInPandas path gets a full
DuckDB oracle: the oracle recomputes the decode from md5(text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_process_spark.multimodal.assets import synthesize_assets
from etl_process_spark.multimodal.ops import decode_image_stats, sample_frames
from etl_process_spark.queries.registry import query, tbl  # noqa: F401

_HEXD = "0123456789abcdef"


def _pair(pos: int) -> str:
    """SQL for int value of md5-hex chars [pos, pos+1] (1-based, 0..255)."""
    return (
        f"((strpos('{_HEXD}', substr(hx, {pos}, 1)) - 1) * 16"
        f" + strpos('{_HEXD}', substr(hx, {pos + 1}, 1)) - 1)"
    )


@query(
    "image_decode_stats",
    f"""
    WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents)
    SELECT doc_id AS asset_id,
           CAST(16 + {_pair(1)} AS INT) AS width,
           CAST(16 + {_pair(3)} AS INT) AS height,
           CAST(1 + (strpos('{_HEXD}', substr(hx, 5, 1)) - 1) % 3 AS INT) AS channels,
           round({_pair(7)} / 255.0, 6) AS mean_luma
    FROM h
    """,
)
def image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode via Arrow-batched mapInPandas: binary content in,
    intrinsic stats out (bytes never leave the executor). The deterministic
    stand-in decoder makes the Python path oracle-checkable."""
    return decode_image_stats(synthesize_assets(spark, sf_dir))


@query(
    "video_frame_sample",
    """
    WITH v AS (
      SELECT doc_id, octet_length(encode(text)) AS nb,
             greatest(1, CAST(ceil(octet_length(encode(text)) / 256.0) AS INT)) AS nf
      FROM documents
    )
    SELECT doc_id AS asset_id,
           CAST(idx AS INT) AS frame_idx,
           CAST(greatest(0, least(256, nb - idx * 256)) AS INT) AS frame_len
    FROM v, unnest(range(0, nf, 2)) AS t(idx)
    """,
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the fake fixed-chunk video container: one asset
    row fans out to every 2nd frame inside the Arrow batch — the
    row-explosion shape of video pipelines, with bounded memory."""
    return sample_frames(synthesize_assets(spark, sf_dir), every_n=2).select(
        "asset_id", "frame_idx", "frame_len"
    )


@query(
    "audio_feature_stats",
    """
    WITH b AS (
      SELECT doc_id,
             [ascii(substr(text, i, 1)) - 128
              for i in range(1, length(text) + 1)] AS cs
      FROM documents
    )
    SELECT doc_id AS asset_id,
           CAST(len(cs) AS INTEGER) AS n_samples,
           CAST((1000000 * list_sum([abs(x) for x in cs])) // len(cs) AS BIGINT)
               AS mean_amp_ppm,
           CAST(floor(sqrt(list_sum([CAST(x AS DOUBLE) * x for x in cs])
                           / len(cs)) * 1000000) AS BIGINT)
               AS rms_e6
    FROM b
    """,
)
def audio_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over binary columns via Arrow-batched
    mapInPandas (multimodal/ops.py::audio_features): bytes → sample count,
    mean amplitude, RMS, computed vectorized per batch. The stand-in
    decoder treats bytes as unsigned 8-bit PCM — deterministic, so the
    Python path is fully oracle-checked (the oracle recomputes the same
    features from the UTF-8 code points)."""
    from etl_process_spark.multimodal.ops import audio_features

    return audio_features(synthesize_assets(spark, sf_dir))


@query(
    "image_phash_dup_pairs",
    """
    WITH h AS (SELECT doc_id AS asset_id, substr(md5(text), 1, 16) AS ph
               FROM documents),
    p AS (SELECT asset_id,
                 CAST('0x' || substr(ph, 1, 8) AS BIGINT) AS h1,
                 CAST('0x' || substr(ph, 9, 8) AS BIGINT) AS h2,
                 ph
          FROM h),
    b AS (SELECT asset_id, i AS band, substr(ph, 1 + 4 * i, 4) AS code
          FROM h, unnest(range(0, 4)) AS t(i)),
    cand AS (SELECT DISTINCT a.asset_id AS asset_a, b2.asset_id AS asset_b
             FROM b a JOIN b b2
               ON a.band = b2.band AND a.code = b2.code
              AND a.asset_id < b2.asset_id)
    SELECT c.asset_a, c.asset_b,
           CAST(bit_count(xor(pa.h1, pb.h1))
                + bit_count(xor(pa.h2, pb.h2)) AS INT) AS hamming,
           bit_count(xor(pa.h1, pb.h1)) + bit_count(xor(pa.h2, pb.h2)) <= 6
             AS is_dup
    FROM cand c
    JOIN p pa ON c.asset_a = pa.asset_id
    JOIN p pb ON c.asset_b = pb.asset_id
    """,
)
def image_phash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection: per-asset 64-bit perceptual hash
    (mapInPandas decode stage), 4×16-bit band buckets for candidate
    generation, exact hamming-distance verify on candidates only.

    The pigeonhole guarantee: any pair within hamming ≤ 3 of the full
    hash shares at least one untouched band, so banding loses nothing
    at that radius; the ≤ 6 verify fence is then exact bit math
    (bit_count of xor on two 32-bit halves — pure codegen). Candidates
    come from an equi join on (band, code): the asset corpus is never
    all-paired, the same LSH shape as the text and embedding dedup
    paths. The stand-in hash has no near-match behavior (codecs.py), so
    pairs here are band collisions scored honestly — with a real pHash
    the SAME plan performs corpus-level image near-dup removal.
    """
    from pyspark.sql import functions as F

    from etl_process_spark.multimodal.assets import synthesize_assets
    from etl_process_spark.multimodal.ops import phash_images

    ph = phash_images(synthesize_assets(spark, sf_dir))
    p = ph.select(
        "asset_id",
        F.conv(F.substring("phash", 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring("phash", 9, 8), 16, 10).cast("long").alias("h2"),
        "phash",
    )
    bands = ph.select(
        "asset_id",
        F.posexplode(
            F.array(*[F.substring("phash", 1 + 4 * i, 4) for i in range(4)])
        ).alias("band", "code"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.code") == F.col("b.code"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
        )
        .distinct()
    )
    pa = p.select(
        F.col("asset_id").alias("asset_a"),
        F.col("h1").alias("h1a"), F.col("h2").alias("h2a"),
    )
    pb = p.select(
        F.col("asset_id").alias("asset_b"),
        F.col("h1").alias("h1b"), F.col("h2").alias("h2b"),
    )
    hamming = F.expr("bit_count(h1a ^ h1b) + bit_count(h2a ^ h2b)")
    return (
        cand.join(pa, "asset_a")
        .join(pb, "asset_b")
        .select(
            "asset_a", "asset_b",
            hamming.cast("int").alias("hamming"),
            (hamming <= 6).alias("is_dup"),
        )
    )
