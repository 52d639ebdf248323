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
           round(list_sum([CAST(abs(x) AS DOUBLE) for x in cs]) / len(cs), 6)
               AS mean_amp,
           round(sqrt(list_sum([CAST(x AS DOUBLE) * x for x in cs]) / len(cs)), 6)
               AS rms
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
