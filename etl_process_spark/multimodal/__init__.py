"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pattern for multimodal data at 100 TB: media bytes live in a
``binary`` column (or object-store pointers), typed metadata travels in a
struct alongside, and every transform is an Arrow-batched ``mapInPandas``
operator — the plumbing (schema, partitioning, batch shape) is identical
whether the decoder is Pillow/ffmpeg or the deterministic stand-in used
here (the real codec libraries are not in this container; see
``codecs.py`` — the swap point is one function).
"""

from etl_process_spark.multimodal.assets import asset_schema, synthesize_assets  # noqa: F401
from etl_process_spark.multimodal.ops import (  # noqa: F401
    audio_features,
    decode_image_stats,
    resize_images,
    sample_frames,
)
