"""Multimodal operators: Arrow-batched mapInPandas over binary columns.

Shape rules that make these scale:

* Decoding is the unavoidable Python stage, so it runs inside
  ``mapInPandas`` — one Arrow batch of (id, bytes) rows in, one batch of
  features out; no row-at-a-time Python UDF, no collect.
* Operators never widen the batch with bytes they don't need: feature
  extractors drop ``content`` in the output schema; frame sampling emits
  bounded chunks. The Arrow transfer carries exactly the declared schema.
* Partitioning is inherited — a decode is embarrassingly parallel, so no
  repartition/shuffle is introduced. Batch size is governed by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` when assets are large.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from etl_process_spark.multimodal import codecs

IMAGE_STATS_SCHEMA = (
    "asset_id long, width int, height int, channels int, luma_ppm long"
)
AUDIO_FEATURES_SCHEMA = (
    "asset_id long, n_samples int, mean_amp_ppm long, rms_e6 long"
)
FRAME_SCHEMA = "asset_id long, frame_idx int, frame_len int, frame_bytes binary"


def decode_image_stats(assets: DataFrame) -> DataFrame:
    """Decode each image asset to intrinsic stats (width/height/channels/
    mean luma). Output drops the bytes — only features cross the wire."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [codecs.decode_image(bytes(c)) for c in pdf["content"]]
            out = pd.DataFrame(decoded)
            out.insert(0, "asset_id", pdf["asset_id"].to_numpy())
            yield out

    return assets.select("asset_id", "content").mapInPandas(fn, IMAGE_STATS_SCHEMA)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Re-encode image assets at (width, height); bytes in, bytes out.

    Output keeps the asset key and the new content + updated meta — the
    write-back shape for a derived-asset table.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                codecs.resize_image(bytes(c), width, height) for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "content": resized,
                    "width": width,
                    "height": height,
                }
            )

    return assets.select("asset_id", "content").mapInPandas(
        fn, "asset_id long, content binary, width int, height int"
    )


def audio_features(assets: DataFrame) -> DataFrame:
    """Byte-level audio features (sample count, mean amplitude, RMS)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [codecs.decode_audio(bytes(c)) for c in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(0, "asset_id", pdf["asset_id"].to_numpy())
            yield out

    return assets.select("asset_id", "content").mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


def sample_packed_frames(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Sample every n-th frame of a packed-PNG video container
    (codecs.pack_frames) into its own row: one input row fans out to
    ceil(n_frames / every_n) output rows, exploded INSIDE the Arrow
    batch; skipped frames are seeked over by their length prefix, never
    decoded or copied — the keyframe-walk access pattern."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etl_process_spark.multimodal.codecs import iter_packed_frames

        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            lens: list[int] = []
            frames: list[bytes] = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                for idx, chunk in iter_packed_frames(bytes(content), every_n):
                    ids.append(aid)
                    idxs.append(idx)
                    lens.append(len(chunk))
                    frames.append(chunk)
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_idx": idxs,
                    "frame_len": lens,
                    "frame_bytes": frames,
                }
            )

    return assets.select("asset_id", "content").mapInPandas(fn, FRAME_SCHEMA)


FRAME_LUMA_SCHEMA = "asset_id long, frame_idx int, luma_ppm long"


def packed_frame_luma(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Sample every n-th packed frame AND decode it (real PNG decode):
    per-frame exact-integer mean luma — the decode-sampled-frames shape
    of a video feature pipeline, fused into one Python stage so frame
    bytes never cross the Arrow boundary at all."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etl_process_spark.multimodal.codecs import (
            decode_image,
            iter_packed_frames,
        )

        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            lumas: list[int] = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                for idx, chunk in iter_packed_frames(bytes(content), every_n):
                    ids.append(aid)
                    idxs.append(idx)
                    lumas.append(decode_image(chunk)["luma_ppm"])
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "luma_ppm": lumas}
            )

    return assets.select("asset_id", "content").mapInPandas(
        fn, FRAME_LUMA_SCHEMA
    )


RGB_STATS_SCHEMA = (
    "asset_id long, width int, height int, "
    "mean_r_ppm long, mean_g_ppm long, mean_b_ppm long, luma_ppm long"
)


def rgb_channel_stats(assets: DataFrame) -> DataFrame:
    """Decode RGB PNG assets to exact-integer per-channel means and the
    integer ITU-R 601 luma mean — the 3-channel decode path (color
    type 2, interleaved samples, all five un-filters) at corpus scale."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from etl_process_spark.multimodal.pngcodec import decode_png

        for pdf in batches:
            out = {
                "asset_id": [], "width": [], "height": [],
                "mean_r_ppm": [], "mean_g_ppm": [], "mean_b_ppm": [],
                "luma_ppm": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                w, h, c, px = decode_png(bytes(content))
                if c != 3:
                    raise ValueError(f"asset {aid}: expected RGB, got {c}ch")
                p = px.astype(np.int64)
                n = h * w
                luma = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000
                out["asset_id"].append(int(aid))
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r_ppm"].append((1_000_000 * int(p[..., 0].sum())) // (255 * n))
                out["mean_g_ppm"].append((1_000_000 * int(p[..., 1].sum())) // (255 * n))
                out["mean_b_ppm"].append((1_000_000 * int(p[..., 2].sum())) // (255 * n))
                out["luma_ppm"].append((1_000_000 * int(luma.sum())) // (255 * n))
            yield pd.DataFrame(out)

    return assets.select("asset_id", "content").mapInPandas(
        fn, RGB_STATS_SCHEMA
    )


FINGERPRINT_SCHEMA = "asset_id long, word_idx int, word long"


def audio_fingerprint_words(
    assets: DataFrame, frame: int = 128, hop: int = 128, n_bands: int = 33,
) -> DataFrame:
    """Per-asset Haitsma–Kalker fingerprint stream: REAL WAV decode →
    framed DFT band energies → per-frame sign words (codecs.py). One row
    per (asset, word); ``word_idx`` j is the sign word between frames j
    and j+1. Only integers cross the Arrow boundary — the downstream
    matcher band-buckets these words exactly like the SimHash join."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etl_process_spark.multimodal.codecs import audio_fingerprint

        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            words: list[int] = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                ws = audio_fingerprint(
                    bytes(content), frame=frame, hop=hop, n_bands=n_bands
                )
                ids.extend([aid] * len(ws))
                idxs.extend(range(len(ws)))
                words.extend(ws)
            yield pd.DataFrame(
                {"asset_id": ids, "word_idx": idxs, "word": words}
            )

    return assets.select("asset_id", "content").mapInPandas(
        fn, FINGERPRINT_SCHEMA
    )


FRAME_PHASH_SCHEMA = "asset_id long, frame_idx int, phash string"


def packed_frame_phash(assets: DataFrame, every_n: int = 1) -> DataFrame:
    """Per-FRAME perceptual hash over packed-PNG video containers: walk
    each container by length prefix, decode every ``every_n``-th frame,
    emit its 64-bit pHash as 16 hex chars. Bytes never leave the Python
    stage — only (asset_id, frame_idx, digest) rows cross the Arrow
    boundary, so the downstream frame-level LSH join shuffles digests,
    never pixels."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etl_process_spark.multimodal.codecs import (
            iter_packed_frames,
            perceptual_hash,
        )

        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            hashes: list[str] = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                for idx, chunk in iter_packed_frames(bytes(content), every_n):
                    ids.append(int(aid))
                    idxs.append(idx)
                    hashes.append(perceptual_hash(chunk))
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "phash": hashes}
            )

    return assets.select("asset_id", "content").mapInPandas(
        fn, FRAME_PHASH_SCHEMA
    )


PHASH_SCHEMA = "asset_id long, phash string"


def phash_images(assets: DataFrame) -> DataFrame:
    """Per-asset 64-bit perceptual hash (16 hex chars): the Python decode
    stage of image near-dup detection. Bytes stay on the executor; only
    the 16-char digest crosses the wire."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "phash": [
                        codecs.perceptual_hash(bytes(c)) for c in pdf["content"]
                    ],
                }
            )

    return assets.select("asset_id", "content").mapInPandas(fn, PHASH_SCHEMA)
