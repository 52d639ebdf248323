"""Decoders — the dispatch point between container formats and features.

Round ≤4 shipped a deterministic md5 stand-in here because the container
has no Pillow/ffmpeg. Round 5 retires it for the test corpus: PNG images
decode for REAL via the pure-stdlib codec (``pngcodec``: zlib inflate +
per-scanline un-filtering) and WAV audio decodes for REAL via stdlib
``wave`` (``wavcodec``) — so pHash, luma stats, amplitude/RMS features
and the Haitsma–Kalker fingerprint all run end-to-end on actual media
content with zero non-baked dependencies.

Dispatch is by magic bytes. Unknown formats (a JPEG, an MP3) still fall
back to the documented md5-derived stand-in rather than mis-decoding —
that branch is dead code for the synthetic corpus (pinned by test) and
is the single place a JPEG/Opus codec would slot in on a real cluster.
"""

from __future__ import annotations

import hashlib

from etl_process_spark.multimodal.pngcodec import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
)
from etl_process_spark.multimodal.wavcodec import decode_wav, is_wav

def _luma_plane(channels: int, pixels):
    """Grayscale plane of a decoded image as int64: identity for gray,
    integer ITU-R 601-2 ((299R + 587G + 114B) // 1000) for RGB — exact
    integer math, so every downstream feature is engine-reproducible."""
    import numpy as np

    if channels == 1:
        return pixels.astype(np.int64)
    px = pixels.astype(np.int64)
    return (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000


def decode_image(content: bytes) -> dict:
    """Decode an image to (width, height, channels, luma_ppm).

    PNG: REAL decode (pngcodec), luma_ppm = floor(1e6 · Σluma / (255·n))
    — an exact integer, so Spark and the SQL oracle can only agree or
    both be wrong. Non-PNG: the legacy md5-derived stand-in (width =
    16 + hex[0:2], height = 16 + hex[2:4], channels = 1 + hex[4] % 3,
    luma_ppm = hex[6:8]·1e6 // 255), kept for unknown formats only.
    """
    if content[:8] == PNG_SIGNATURE:
        w, h, c, px = decode_png(content)
        luma = _luma_plane(c, px)
        n = int(luma.size)
        return {
            "width": w,
            "height": h,
            "channels": c,
            "luma_ppm": (1_000_000 * int(luma.sum())) // (255 * n),
        }
    h = hashlib.md5(content).hexdigest()
    return {
        "width": 16 + int(h[0:2], 16),
        "height": 16 + int(h[2:4], 16),
        "channels": 1 + int(h[4], 16) % 3,
        "luma_ppm": (1_000_000 * int(h[6:8], 16)) // 255,
    }


def resize_image(content: bytes, width: int, height: int) -> bytes:
    """Resize an image's bytes to (width, height).

    PNG: REAL area (mean-pool) resample per channel — each output cell
    averages its index bin, rounded half-up to uint8 — re-encoded as
    PNG. The bin means are exact-integer sums over exact counts, so the
    resampled pixels are engine-reproducible (the resize oracle query
    recomputes them in SQL). Non-PNG: explicit tagged stub (no codec →
    nothing meaningful to produce; impossible to mistake for real data).
    """
    import numpy as np

    if content[:8] == PNG_SIGNATURE:
        _, _, c, px = decode_png(content)
        if c == 1:
            planes = [_area_resize(px.astype(np.float64), height, width)]
        else:
            planes = [
                _area_resize(px[:, :, i].astype(np.float64), height, width)
                for i in range(c)
            ]
        pooled = np.stack(planes, axis=-1)
        out = np.floor(pooled + 0.5).clip(0, 255).astype(np.uint8)
        return encode_png(out[:, :, 0] if c == 1 else out)
    return b"FAKERESIZE:%dx%d:" % (width, height) + content


def decode_audio(content: bytes) -> dict:
    """Audio features: (n_samples, mean amplitude in ppm-of-fullscale-ish
    integer units, RMS ×1e6 floored).

    WAV: REAL decode (stdlib ``wave``) to signed PCM samples; features
    are exact integer sums over those samples. Non-WAV: the legacy
    byte-level path (bytes as unsigned 8-bit PCM, centered at 128).
    Both paths emit integer ppm/e6 values — no engine round() can
    diverge them.
    """
    import math

    import numpy as np

    if is_wav(content):
        samples, _rate = decode_wav(content)
    else:
        samples = np.frombuffer(content, dtype=np.uint8).astype("int64") - 128
    if samples.size == 0:
        return {"n_samples": 0, "mean_amp_ppm": 0, "rms_e6": 0}
    n = int(samples.size)
    abs_sum = int(np.abs(samples).sum())
    sq_sum = int((samples * samples).sum())
    return {
        "n_samples": n,
        "mean_amp_ppm": (1_000_000 * abs_sum) // n,
        "rms_e6": math.floor(math.sqrt(sq_sum / n) * 1_000_000.0),
    }


def pack_frames(frames: list[bytes]) -> bytes:
    """The synthetic video container: frames as length-prefixed blobs
    (4-byte big-endian length + payload, concatenated). A real container
    (MP4/MKV) indexes keyframes; this preserves the essential property —
    a frame is seekable without decoding its neighbors."""
    import struct

    return b"".join(struct.pack(">I", len(f)) + f for f in frames)


def iter_packed_frames(content: bytes, every_n: int = 1):
    """Walk a ``pack_frames`` container, yielding (frame_idx, frame_bytes)
    for every ``every_n``-th frame. Skipped frames are seeked over by
    their length prefix — never decoded, never copied."""
    import struct

    pos = 0
    idx = 0
    while pos + 4 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        end = pos + 4 + length
        if end > len(content):
            raise ValueError("packed-frame container truncated")
        if idx % every_n == 0:
            yield idx, content[pos + 4 : end]
        pos = end
        idx += 1
    if pos != len(content):
        # 1-3 trailing bytes can't be a length prefix: container corruption
        raise ValueError(
            f"packed-frame container has {len(content) - pos} trailing "
            "garbage bytes after the last complete frame"
        )


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis matrix (no scipy needed):
    M[k,i] = s_k · cos(π·(2i+1)·k / 2n), s_0 = √(1/n), s_k = √(2/n)."""
    import numpy as np

    i = np.arange(n)
    k = np.arange(n)[:, None]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


def _area_resize(gray, th: int, tw: int):
    """Mean-pool an arbitrary (h, w) float array to (th, tw): each output
    cell averages its index bin (bin of row r = r·th // h) —
    deterministic, no interpolation library. Inputs smaller than the
    target on a side repeat the nearest populated row/col."""
    import numpy as np

    g = np.asarray(gray, dtype=np.float64)
    h, w = g.shape
    rb = (np.arange(h) * th // max(h, 1)).clip(max=th - 1)
    cb = (np.arange(w) * tw // max(w, 1)).clip(max=tw - 1)
    out = np.zeros((th, tw))
    cnt = np.zeros((th, tw))
    np.add.at(out, (rb[:, None].repeat(w, 1), cb[None, :].repeat(h, 0)), g)
    np.add.at(cnt, (rb[:, None].repeat(w, 1), cb[None, :].repeat(h, 0)), 1.0)
    cnt[cnt == 0] = 1.0  # padded bins (input < target): nearest row/col
    out = out / cnt
    # fill empty bins from the nearest populated one (only when h or w < target)
    if h < th:
        filled = np.zeros(th, dtype=bool)
        filled[rb] = True
        last = 0
        for r in range(th):
            if filled[r]:
                last = r
            else:
                out[r] = out[last]
    if w < tw:
        filledc = np.zeros(tw, dtype=bool)
        filledc[cb] = True
        lastc = 0
        for c in range(tw):
            if filledc[c]:
                lastc = c
            else:
                out[:, c] = out[:, lastc]
    return out


def _area_resize_32(gray):
    """Mean-pool to 32×32 — the pHash front-end."""
    return _area_resize(gray, 32, 32)


def phash_from_pixels(gray) -> str:
    """REAL pHash math over a grayscale pixel array: mean-pool to 32×32,
    orthonormal DCT-II (explicit basis matmul — no scipy), keep the
    top-left 8×8 low-frequency block, threshold each AC coefficient at
    the median of the 63 AC coefficients, emit 64 sign bits MSB-first as
    16 hex chars. The DC bit is pinned to 0, which makes the hash
    exactly invariant under affine luma changes a·g + b (a > 0): AC
    coefficients scale by a (> 0 preserves every comparison) and b moves
    only DC. Near-identical images land within small Hamming distance —
    the property the banded near-dup join exploits.
    """
    import numpy as np

    g = _area_resize_32(gray)
    m = _dct_matrix(32)
    block = (m @ g @ m.T)[:8, :8].reshape(64)
    med = float(np.median(block[1:]))
    bits = block > med
    bits[0] = False
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return f"{val:016x}"


def perceptual_hash(content: bytes) -> str:
    """64-bit perceptual hash as 16 hex chars.

    PNG: REAL end-to-end — stdlib decode → integer luma plane →
    ``phash_from_pixels`` (mean-pool → DCT-II → AC-median sign bits).
    Non-PNG fallback: the first 16 hex chars of the content md5 — NOT
    perceptual, same 64-bit contract, dead code for the test corpus.
    """
    if content[:8] == PNG_SIGNATURE:
        _, _, c, px = decode_png(content)
        return phash_from_pixels(_luma_plane(c, px))
    return hashlib.md5(content).hexdigest()[:16]


def band_edges(frame: int, n_bands: int):
    """Band-edge bins for the Haitsma–Kalker fingerprint: log-spaced over
    [1, frame//2) (DC excluded), falling back to linear edges when the
    log grid collapses at small frame sizes. Exposed so the SQL oracle
    can embed the EXACT same integer edges as literals."""
    import numpy as np

    lo, hi = 1, frame // 2
    edges = np.unique(
        np.floor(lo * (hi / lo) ** (np.arange(n_bands + 1) / n_bands)).astype(int)
    )
    if len(edges) < n_bands + 1:  # tiny frame: fall back to linear edges
        edges = np.linspace(lo, hi, n_bands + 1).astype(int)
    if np.any(np.diff(edges) <= 0):
        # duplicate integer edges (e.g. frame so small that even the
        # linear grid collapses) would make np.add.reduceat silently
        # emit degenerate band energies — fail loudly instead
        raise ValueError(
            f"band_edges({frame}, {n_bands}): grid collapses to "
            f"non-monotone integer edges; pick fewer bands or a larger frame"
        )
    return edges


def audio_fingerprint_from_samples(samples, frame: int = 1024, hop: int = 512,
                                   n_bands: int = 33):
    """REAL audio-fingerprint math (Haitsma & Kalker 2002, the
    Philips/chromaprint family) over a 1-D sample array: frame the
    signal, DFT magnitude spectrum per frame (explicit real/imag basis
    matmuls — no scipy), ``n_bands`` log-spaced band energies, and per
    frame a 32-bit word whose bit b is the sign of the band-energy
    difference-of-differences
    (E[t,b]−E[t,b+1]) − (E[t−1,b]−E[t−1,b+1]) > 0.

    Properties (pinned by tests): amplitude scaling a·x (a>0) flips no
    bit (every energy scales by a², preserving every comparison);
    distinct tones land in different bands and differ in many bits;
    mild noise flips few bits. Returns a list of per-frame 32-bit ints
    (the fingerprint stream a matcher would band-bucket exactly like
    the SimHash/pHash Hamming joins).
    """
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if x.size < 2 * frame:
        return []
    n_frames = 1 + (x.size - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx]
    k = np.arange(frame // 2 + 1)[:, None]
    t = np.arange(frame)[None, :]
    ang = 2.0 * np.pi * k * t / frame
    re = frames @ np.cos(ang).T
    im = frames @ np.sin(ang).T
    power = re * re + im * im
    # log-spaced band edges over bins [1, frame//2): DC excluded
    lo = 1
    edges = band_edges(frame, n_bands)
    energies = np.add.reduceat(power[:, lo:frame // 2], edges[:-1] - lo, axis=1)
    d = energies[:, :-1] - energies[:, 1:]           # (frames, n_bands-1)
    dd = d[1:] - d[:-1]                              # diff across time
    bits = dd > 0
    words = []
    for row in bits:
        w = 0
        for b in row[:32]:
            w = (w << 1) | int(b)
        words.append(w)
    return words


def audio_fingerprint(content: bytes, frame: int = 1024, hop: int = 512,
                      n_bands: int = 33):
    """Container-level fingerprint: REAL WAV decode → Haitsma–Kalker
    words. Non-WAV bytes go through the legacy unsigned-8-bit view."""
    import numpy as np

    if is_wav(content):
        samples, _ = decode_wav(content)
    else:
        samples = np.frombuffer(content, dtype=np.uint8).astype("int64") - 128
    return audio_fingerprint_from_samples(samples, frame, hop, n_bands)
