"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pattern for multimodal data at 100 TB: media bytes live in a
``binary`` column (or object-store pointers), typed metadata travels in
a struct alongside, and every transform is an Arrow-batched
``mapInPandas`` operator. As of round 5 the decode itself is REAL with
zero non-baked dependencies: PNG via the pure-stdlib zlib codec
(``pngcodec``), WAV via stdlib ``wave`` (``wavcodec``), video as a
packed container of length-prefixed PNG frames. ``codecs.py`` is the
format dispatch; unknown formats (JPEG/Opus) fall back to a documented
deterministic stand-in and are the one place a binary codec library
would slot in on a real cluster.
"""

from etl_process_spark.multimodal.assets import (  # noqa: F401
    asset_schema,
    synthesize_assets,
    synthesize_audio_assets,
    synthesize_image_assets,
    synthesize_paired_audio_assets,
    synthesize_paired_video_assets,
    synthesize_rgb_image_assets,
    synthesize_video_assets,
)
from etl_process_spark.multimodal.ops import (  # noqa: F401
    audio_features,
    audio_fingerprint_words,
    decode_image_stats,
    packed_frame_luma,
    packed_frame_phash,
    phash_images,
    resize_images,
    rgb_channel_stats,
    sample_packed_frames,
)
