"""Asset table: the binary-column data model for multimodal pipelines.

Schema contract: one row per media asset —

* ``asset_id``     stable key
* ``media_type``   MIME-ish discriminator (``image/fake`` etc.)
* ``content``      the opaque bytes (BinaryType). At 100 TB this column is
                   either inlined (small assets) or an object-store URI +
                   byte-range; everything downstream only assumes "bytes
                   arrive in the Arrow batch".
* ``meta``         typed struct of intrinsic properties, populated at
                   ingest so planners can filter/partition WITHOUT
                   touching bytes (predicate pushdown on meta.width never
                   decodes an image).

The test/bench corpus is synthesized deterministically from the driver's
``documents`` table. Round 5 adds REAL containers with zero new
dependencies:

* ``synthesize_image_assets`` — actual PNGs (stdlib zlib codec), pixels
  from an exact integer rule on md5 hex, so the DuckDB oracle recomputes
  pixel-derived features (luma, pooled means, even the DCT sign bits)
  from SQL while Spark derives them by DECODING THE BYTES.
* ``synthesize_audio_assets`` — actual mono 16-bit PCM WAVs whose sample
  values are the document's byte stream centered at 128 (lossless, so
  the audio-feature oracle is unchanged from the byte-level era).
* ``synthesize_video_assets`` — a packed container of length-prefixed
  PNG frames: frame sampling seeks by prefix, sampled frames decode for
  real.

``synthesize_assets`` (utf-8 text bytes + md5-derived meta) remains the
format-agnostic corpus for plumbing-level queries.

The shared pixel rule (one md5 per image row, then exact integer
mixing) keeps Python-side synthesis vectorized and SQL-side recompute
cheap. Pair groups (gid = doc_id − doc_id % 2): the even doc carries
the BASE image (values 0..127), the odd doc its exact affine-luma twin
2·g + 1 — byte-DIFFERENT but perceptually identical, ground-truth
duplicate pairs the pHash near-dup join must recover (pHash is exactly
invariant under a·g + b with a > 0).
"""

from __future__ import annotations

import functools as _functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asset_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("content", T.BinaryType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("width", T.IntegerType()),
                        T.StructField("height", T.IntegerType()),
                        T.StructField("channels", T.IntegerType()),
                        T.StructField("n_bytes", T.LongType()),
                    ]
                ),
            ),
        ]
    )


def _hex_pair(col, pos: int):
    """Integer value of md5 hex chars [pos, pos+1] (0..255), JVM-side."""
    return F.conv(F.substring(col, pos, 2), 16, 10).cast("int")


def synthesize_assets(
    spark: SparkSession, sf_dir: str, media_type: str = "image/fake"
) -> DataFrame:
    """Deterministic asset table from the documents corpus.

    content = utf-8 bytes of the document text; meta.width/height/channels
    come from the content's md5 (16+hex(0:2), 16+hex(2:4), 1+hex(4)%3) —
    the same derivation the fake decoder and the DuckDB oracle use, so
    ingest-time metadata and decode-time observation provably agree.
    """
    from etl_process_spark.operators.dedup import ensure_parallelism

    # spread the narrow test input before the (partition-preserving)
    # decode operators downstream — they inherit this parallelism
    docs = ensure_parallelism(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    content = F.encode(F.col("text"), "UTF-8")
    h = F.md5(content)
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        content.alias("content"),
        F.struct(
            (F.lit(16) + _hex_pair(h, 1)).alias("width"),
            (F.lit(16) + _hex_pair(h, 3)).alias("height"),
            (F.lit(1) + F.conv(F.substring(h, 5, 1), 16, 10).cast("int") % 3).alias(
                "channels"
            ),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Real-container corpora (round 5): PNG images, PCM WAVs, packed-PNG video.
# Every constant below is part of the oracle contract — the DuckDB side
# recomputes features from the SAME rule, so change both or neither.
# ---------------------------------------------------------------------------

IMG_DIM_MIN, IMG_DIM_SPAN = 32, 65          # h, w ∈ [32, 96]
VID_FRAME_DIM = 24                          # video frames are 24×24 gray


def image_group(doc_id: int) -> int:
    """Every even doc and its odd successor form one image GROUP: the
    even doc carries the base image, the odd doc carries its exact
    affine-luma twin (2·g + 1) — DIFFERENT bytes, PERCEPTUALLY identical
    (pHash is exactly invariant under a·g + b, a > 0), the honest ground
    truth for perceptual near-dup detection."""
    return doc_id - (doc_id % 2)


def image_pixels(gid: int):
    """The exact-integer BASE pixel rule for image group ``gid``.

    dims:   hx = md5(str(gid)); h = 32 + hx[0:2] % 65, w = 32 + hx[2:4] % 65
    pixels: rs[r] = md5(f"{gid}:{r}")[0:4] (one md5 PER ROW, so synthesis
            stays vectorized); g[r][c] = (rs[r]·(c+7) + 3r) mod 128

    Base values live in [0, 127] so the odd twin's affine transform
    2·g + 1 stays inside uint8 ([1, 255]) EXACTLY — both engines
    reproduce every pixel with integer math (DuckDB: string md5 + '0x'
    casts), which is what lets the decode/pHash/resize oracles verify
    the REAL codec path end-to-end.
    """
    import hashlib

    import numpy as np

    hx = hashlib.md5(str(gid).encode()).hexdigest()
    h = IMG_DIM_MIN + int(hx[0:2], 16) % IMG_DIM_SPAN
    w = IMG_DIM_MIN + int(hx[2:4], 16) % IMG_DIM_SPAN
    rs = np.array(
        [
            int(hashlib.md5(f"{gid}:{r}".encode()).hexdigest()[:4], 16)
            for r in range(h)
        ],
        dtype=np.int64,
    )
    c = np.arange(w, dtype=np.int64)
    g = (rs[:, None] * (c[None, :] + 7) + 3 * np.arange(h, dtype=np.int64)[:, None]) % 128
    return g.astype("uint8")


def doc_image_pixels(doc_id: int):
    """The ACTUAL pixels of a document's image: the group base for even
    docs, the exact affine-luma twin 2·g + 1 for odd docs."""
    base = image_pixels(image_group(doc_id))
    if doc_id % 2 == 0:
        return base
    return (2 * base.astype("int64") + 1).astype("uint8")


def frame_pixels(doc_id: int, f: int):
    """Video-frame pixel rule: fs[r] = md5(f"{doc_id}:{f}:{r}")[0:4];
    g[r][c] = (fs[r]·(c+5) + 7r) mod 256 over a 24×24 frame."""
    import hashlib

    import numpy as np

    d = VID_FRAME_DIM
    fs = np.array(
        [
            int(hashlib.md5(f"{doc_id}:{f}:{r}".encode()).hexdigest()[:4], 16)
            for r in range(d)
        ],
        dtype=np.int64,
    )
    c = np.arange(d, dtype=np.int64)
    g = (fs[:, None] * (c[None, :] + 5) + 7 * np.arange(d, dtype=np.int64)[:, None]) % 256
    return g.astype("uint8")


def _docs_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_process_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


@_functools.lru_cache(maxsize=16384)
def _png_for_doc(doc_id: int) -> tuple[bytes, int, int]:
    """(png_bytes, height, width) for a document's image — memoized per
    worker process (pure function of doc_id: base image for even docs,
    affine twin for odd; the synthesis queries re-derive the corpus on
    each run). ~3 KB per entry; 16384 entries ≲ 50 MB/worker."""
    from etl_process_spark.multimodal.pngcodec import encode_png

    px = doc_image_pixels(doc_id)
    return encode_png(px), px.shape[0], px.shape[1]


def synthesize_image_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One REAL PNG per document: even docs carry the group base image,
    odd docs its exact affine-luma twin (doc_image_pixels) — so every
    pair is BYTE-DIFFERENT but perceptually identical, the ground truth
    the pHash near-dup join must recover.

    The encoder cycles scanline filters (row % 5), so decoding the corpus
    exercises ALL five PNG un-filter paths — None/Sub/Up/Average/Paeth —
    not just the trivial one.
    """
    from collections.abc import Iterator

    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, contents, widths, heights = [], [], [], []
            for doc_id in pdf["doc_id"]:
                png, h, w = _png_for_doc(int(doc_id))
                ids.append(int(doc_id))
                contents.append(png)
                heights.append(h)
                widths.append(w)
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media_type": "image/png",
                    "content": contents,
                    "width": widths,
                    "height": heights,
                }
            )

    raw = _docs_ids(spark, sf_dir).select("doc_id").mapInPandas(
        fn,
        "asset_id long, media_type string, content binary, "
        "width int, height int",
    )
    return raw.select(
        "asset_id",
        "media_type",
        "content",
        F.struct(
            "width",
            "height",
            F.lit(1).alias("channels"),
            F.length("content").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _require_ascii(doc_id, text: str) -> str:
    """The audio oracles rebuild the sample stream with per-CHARACTER
    ``ascii(substr(text, i, 1))`` in SQL, which equals the utf-8 BYTE
    stream only for ASCII text. The driver corpus satisfies this; any
    future multi-byte character must fail loudly here rather than
    silently diverging the oracle (different code-point values AND a
    different sample count)."""
    text = text or ""
    if not text.isascii():
        raise ValueError(
            f"doc {doc_id}: non-ASCII text breaks the audio oracle "
            "contract (per-character ascii() != per-byte sample stream)"
        )
    return text


def synthesize_audio_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One REAL mono 16-bit PCM WAV per document: sample i is the
    document's i-th utf-8 byte minus 128 (the same centered values the
    byte-level era used, so the feature oracle carries over verbatim —
    WAV PCM is lossless). ASCII-only corpus contract enforced by
    ``_require_ascii``."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from etl_process_spark.multimodal.wavcodec import encode_wav

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, contents, counts = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(
                    _require_ascii(doc_id, text).encode("utf-8"),
                    dtype=np.uint8,
                ).astype(np.int16)
                wav = encode_wav(b - 128)
                ids.append(int(doc_id))
                contents.append(wav)
                counts.append(int(b.size))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media_type": "audio/wav",
                    "content": contents,
                    "n_samples": counts,
                }
            )

    raw = _docs_ids(spark, sf_dir).select("doc_id", "text").mapInPandas(
        fn, "asset_id long, media_type string, content binary, n_samples int"
    )
    return raw.select(
        "asset_id",
        "media_type",
        "content",
        F.struct(
            F.col("n_samples").alias("width"),
            F.lit(1).alias("height"),
            F.lit(1).alias("channels"),
            F.length("content").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def synthesize_video_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One packed-PNG video per document: 2 + (doc_id mod 3) frames of
    24×24 gray (frame_pixels rule), each a real PNG, length-prefixed in
    the container (codecs.pack_frames)."""
    from collections.abc import Iterator

    import pandas as pd

    from etl_process_spark.multimodal.codecs import pack_frames
    from etl_process_spark.multimodal.pngcodec import encode_png

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, contents, nframes = [], [], []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                nf = 2 + did % 3
                frames = [
                    encode_png(frame_pixels(did, f)) for f in range(nf)
                ]
                ids.append(did)
                contents.append(pack_frames(frames))
                nframes.append(nf)
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media_type": "video/x-packed-png",
                    "content": contents,
                    "n_frames": nframes,
                }
            )

    raw = _docs_ids(spark, sf_dir).select("doc_id").mapInPandas(
        fn, "asset_id long, media_type string, content binary, n_frames int"
    )
    return raw.select(
        "asset_id",
        "media_type",
        "content",
        F.struct(
            F.lit(VID_FRAME_DIM).alias("width"),
            F.lit(VID_FRAME_DIM).alias("height"),
            F.col("n_frames").alias("channels"),
            F.length("content").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def paired_video_shape(gid: int) -> tuple[int, int]:
    """(n_frames, twin_start) for a paired-video group: the even doc
    carries 4 + (gid/2) % 3 base frames; the odd twin carries frames
    [s, nf) with s = (gid/2) % 2 — half the twins are ALSO shifted by
    one frame, so the matcher's temporal-alignment vote is exercised at
    both offset 0 and offset 1."""
    return 4 + (gid // 2) % 3, (gid // 2) % 2


def paired_frame_pixels(gid: int, f: int):
    """BASE pixel rule for paired-video frame ``f`` of group ``gid``:
    fs[r] = md5(f"{gid}:pv:{f}:{r}")[0:4]; g[r][c] = (fs·(c+5) + 7r)
    mod 128 over 24×24 — values in [0, 127] so the odd twin's affine
    map 2·g + 1 stays inside uint8 exactly (the video analogue of
    ``image_pixels``)."""
    import hashlib

    import numpy as np

    d = VID_FRAME_DIM
    fs = np.array(
        [
            int(hashlib.md5(f"{gid}:pv:{f}:{r}".encode()).hexdigest()[:4], 16)
            for r in range(d)
        ],
        dtype=np.int64,
    )
    c = np.arange(d, dtype=np.int64)
    g = (fs[:, None] * (c[None, :] + 5) + 7 * np.arange(d, dtype=np.int64)[:, None]) % 128
    return g.astype("uint8")


def synthesize_paired_video_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired packed-PNG video corpus for video near-dup detection: the
    even doc of each group carries nf base frames (``paired_frame_pixels``);
    the odd doc carries frames [s, nf) of its even buddy, each under the
    exact affine-luma map 2·g + 1 — byte-different frames with IDENTICAL
    per-frame pHashes, displaced in time by s ∈ {0, 1}. Ground truth a
    frame-level LSH + temporal-vote matcher must recover."""
    from collections.abc import Iterator

    import pandas as pd

    from etl_process_spark.multimodal.codecs import pack_frames
    from etl_process_spark.multimodal.pngcodec import encode_png

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, contents, nframes = [], [], []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                gid = image_group(did)
                nf, s = paired_video_shape(gid)
                if did % 2 == 0:
                    frames = [
                        encode_png(paired_frame_pixels(gid, f))
                        for f in range(nf)
                    ]
                else:
                    frames = [
                        encode_png(
                            (2 * paired_frame_pixels(gid, f).astype("int64")
                             + 1).astype("uint8")
                        )
                        for f in range(s, nf)
                    ]
                ids.append(did)
                contents.append(pack_frames(frames))
                nframes.append(len(frames))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media_type": "video/x-packed-png",
                    "content": contents,
                    "n_frames": nframes,
                }
            )

    raw = _docs_ids(spark, sf_dir).select("doc_id").mapInPandas(
        fn, "asset_id long, media_type string, content binary, n_frames int"
    )
    return raw.select(
        "asset_id",
        "media_type",
        "content",
        F.struct(
            F.lit(VID_FRAME_DIM).alias("width"),
            F.lit(VID_FRAME_DIM).alias("height"),
            F.col("n_frames").alias("channels"),
            F.length("content").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


RGB_DIM_MIN, RGB_DIM_SPAN = 16, 33          # rgb h, w ∈ [16, 48]


def rgb_image_pixels(doc_id: int):
    """Exact-integer RGB pixel rule (one md5 per row, three channel
    mixes): rs[r] = md5(f"{doc_id}:rgb:{r}")[0:4];
    R = (rs·(c+7) + 3r) mod 256, G = (rs·(c+11) + 5r) mod 256,
    B = (rs·(c+13) + r) mod 256. Dims from md5(f"{doc_id}:rgb")."""
    import hashlib

    import numpy as np

    hx = hashlib.md5(f"{doc_id}:rgb".encode()).hexdigest()
    h = RGB_DIM_MIN + int(hx[0:2], 16) % RGB_DIM_SPAN
    w = RGB_DIM_MIN + int(hx[2:4], 16) % RGB_DIM_SPAN
    rs = np.array(
        [
            int(hashlib.md5(f"{doc_id}:rgb:{r}".encode()).hexdigest()[:4], 16)
            for r in range(h)
        ],
        dtype=np.int64,
    )
    c = np.arange(w, dtype=np.int64)
    r = np.arange(h, dtype=np.int64)[:, None]
    red = (rs[:, None] * (c[None, :] + 7) + 3 * r) % 256
    grn = (rs[:, None] * (c[None, :] + 11) + 5 * r) % 256
    blu = (rs[:, None] * (c[None, :] + 13) + r) % 256
    return np.stack([red, grn, blu], axis=-1).astype("uint8")


@_functools.lru_cache(maxsize=16384)
def _rgb_png_for_doc(doc_id: int) -> tuple[bytes, int, int]:
    from etl_process_spark.multimodal.pngcodec import encode_png

    px = rgb_image_pixels(doc_id)
    return encode_png(px), px.shape[0], px.shape[1]


def synthesize_rgb_image_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One REAL RGB PNG (color type 2) per document — the 3-channel
    decode path exercised at corpus scale, same cycling-filter encoder."""
    from collections.abc import Iterator

    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, contents, widths, heights = [], [], [], []
            for doc_id in pdf["doc_id"]:
                png, h, w = _rgb_png_for_doc(int(doc_id))
                ids.append(int(doc_id))
                contents.append(png)
                heights.append(h)
                widths.append(w)
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media_type": "image/png",
                    "content": contents,
                    "width": widths,
                    "height": heights,
                }
            )

    raw = _docs_ids(spark, sf_dir).select("doc_id").mapInPandas(
        fn,
        "asset_id long, media_type string, content binary, "
        "width int, height int",
    )
    return raw.select(
        "asset_id",
        "media_type",
        "content",
        F.struct(
            "width",
            "height",
            F.lit(3).alias("channels"),
            F.length("content").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def twin_shift_hops(gid: int, max_shift_hops: int) -> int:
    """Deterministic per-group hop shift for the odd audio twin:
    0 when shifting is off, else 1 + (gid/2) mod max — every group's
    twin is shifted by a DIFFERENT, SQL-recomputable amount."""
    if max_shift_hops <= 0:
        return 0
    return 1 + (gid // 2) % max_shift_hops


def synthesize_paired_audio_assets(
    spark: SparkSession,
    sf_dir: str,
    max_shift_hops: int = 0,
    hop: int = 128,
) -> DataFrame:
    """Paired WAV corpus for audio near-dup detection: the even doc of
    each group carries its own byte-stream audio; the odd doc carries
    its even buddy's samples amplitude-DOUBLED (2·s, exact in int16
    since |s| ≤ 128) — byte-different audio with an IDENTICAL
    Haitsma–Kalker fingerprint (every band energy scales by 4, flipping
    no difference sign), the ground truth a fingerprint matcher must
    recover. The audio analogue of the image corpus' affine-luma twins.

    With ``max_shift_hops > 0`` the odd twin is ADDITIONALLY time-shifted
    by k = ``twin_shift_hops(gid)`` whole hops (samples ``s[k·hop:]``):
    the twin's fingerprint words are then the base's words at word_idx + k
    (frame t of the twin IS frame t+k of the base, bit-exactly — doubling
    is an exponent shift, so no sign flips). An aligned (word_idx, word)
    matcher scores ZERO on these twins; only the offset-vote matcher
    (``wav_fingerprint_offset_pairs``) recovers them — the in-the-wild
    robustness the Haitsma–Kalker paper's matcher is built for."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from etl_process_spark.multimodal.wavcodec import encode_wav

    docs = _docs_ids(spark, sf_dir).select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("gid"), F.col("text").alias("base_text")
    )
    joined = docs.select(
        "doc_id", (F.col("doc_id") - F.col("doc_id") % 2).alias("gid")
    ).join(base, "gid")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, contents, counts = [], [], []
            for doc_id, base_text in zip(pdf["doc_id"], pdf["base_text"]):
                s = np.frombuffer(
                    _require_ascii(doc_id, base_text).encode("utf-8"),
                    dtype=np.uint8,
                ).astype(np.int16) - 128
                did = int(doc_id)
                if did % 2 == 1:
                    k = twin_shift_hops(did - 1, max_shift_hops)
                    s = (2 * s[k * hop:]).astype(np.int16)
                ids.append(did)
                contents.append(encode_wav(s))
                counts.append(int(s.size))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media_type": "audio/wav",
                    "content": contents,
                    "n_samples": counts,
                }
            )

    raw = joined.select("doc_id", "base_text").mapInPandas(
        fn, "asset_id long, media_type string, content binary, n_samples int"
    )
    return raw.select(
        "asset_id",
        "media_type",
        "content",
        F.struct(
            F.col("n_samples").alias("width"),
            F.lit(1).alias("height"),
            F.lit(1).alias("channels"),
            F.length("content").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
