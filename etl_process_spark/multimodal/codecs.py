"""Decoders — the ONE swap point between real codecs and the stand-in.

The container has no Pillow/ffmpeg/librosa, so each decode function
gates on an import-try: with the real library present it decodes real
bytes; without it falls back to a DETERMINISTIC FAKE that derives the
observable properties from the md5 of the content. The fake is not a
mock-object shortcut — it is a pure function of the bytes, reproducible
in any engine (the DuckDB oracle recomputes it), so the full Spark
plumbing around it (schemas, Arrow batches, partitioning) is exercised
for real.
"""

from __future__ import annotations

import hashlib

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # type: ignore

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

FRAME_BYTES = 256  # fake video container: fixed-size frame chunks


def decode_image(content: bytes) -> dict:
    """Decode an image to (width, height, channels, mean_luma).

    Real path: Pillow. Fake path: md5-derived — width = 16 + hex[0:2],
    height = 16 + hex[2:4], channels = 1 + hex[4] % 3, mean_luma =
    hex[6:8] / 255 (all hex pairs read as base-16 ints).
    """
    if HAVE_PIL:  # pragma: no cover
        import io

        with Image.open(io.BytesIO(content)) as img:
            import numpy as np

            arr = np.asarray(img.convert("L"), dtype="float64")
            return {
                "width": img.width,
                "height": img.height,
                "channels": len(img.getbands()),
                "mean_luma": _round6_half_up(float(arr.mean()) / 255.0),
            }
    h = hashlib.md5(content).hexdigest()
    return {
        "width": 16 + int(h[0:2], 16),
        "height": 16 + int(h[2:4], 16),
        "channels": 1 + int(h[4], 16) % 3,
        "mean_luma": _round6_half_up(int(h[6:8], 16) / 255.0),
    }


def resize_image(content: bytes, width: int, height: int) -> bytes:
    """Resize an image's bytes to (width, height).

    Real path: Pillow re-encode. Without a codec there is nothing
    meaningful to produce, so the fake path is an explicit stub: a tagged
    header + the original bytes, letting downstream plumbing (schema,
    sizes, lineage) be tested while making the substitution impossible to
    miss in data.
    """
    if HAVE_PIL:  # pragma: no cover
        import io

        with Image.open(io.BytesIO(content)) as img:
            out = io.BytesIO()
            img.resize((width, height)).save(out, format=img.format or "PNG")
            return out.getvalue()
    return b"FAKERESIZE:%dx%d:" % (width, height) + content


def _round6_half_up(x: float) -> float:
    """round(x, 6) with ties AWAY from zero (x >= 0), matching SQL round.

    Python/numpy round half-to-even, but both DuckDB and Spark round
    doubles half-away-from-zero. mean_amp is an integer sum divided by a
    power-of-two sample count, so exact 6-decimal ties (…0625 → …063)
    genuinely occur and the two conventions diverge on real data.
    """
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def decode_audio(content: bytes) -> dict:
    """Audio features from raw bytes treated as unsigned 8-bit PCM.

    (With librosa/soundfile present this would parse the container; the
    byte-level features below are themselves deterministic and real.)
    """
    import numpy as np

    import math

    samples = np.frombuffer(content, dtype=np.uint8).astype("int64")
    if samples.size == 0:
        return {"n_samples": 0, "mean_amp_ppm": 0, "rms_e6": 0}
    centered = samples - 128
    n = int(samples.size)
    # exact integer sums (|x| <= 128), so the boundary values are pure
    # integer ppm / floor(x*1e6) — no engine round() can diverge them
    abs_sum = int(np.abs(centered).sum())
    sq_sum = int((centered * centered).sum())
    return {
        "n_samples": n,
        "mean_amp_ppm": (1000000 * abs_sum) // n,
        "rms_e6": math.floor(math.sqrt(sq_sum / n) * 1000000.0),
    }


def iter_frames(content: bytes, every_n: int = 1):
    """Frame iterator over the fake fixed-chunk video container.

    Yields (frame_idx, frame_bytes) for every ``every_n``-th FRAME_BYTES
    chunk. A real container would seek keyframes via ffmpeg; the chunk
    walk preserves the exact access pattern (sequential, bounded memory).
    """
    n_frames = max(1, -(-len(content) // FRAME_BYTES))
    for idx in range(0, n_frames, every_n):
        yield idx, content[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis matrix (no scipy needed):
    M[k,i] = s_k · cos(π·(2i+1)·k / 2n), s_0 = √(1/n), s_k = √(2/n)."""
    import numpy as np

    i = np.arange(n)
    k = np.arange(n)[:, None]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


def _area_resize_32(gray):
    """Mean-pool an arbitrary (h, w) float array to 32×32: each output
    cell averages its index bin — deterministic, no interpolation
    library. Inputs smaller than 32 on a side repeat rows/cols (bin
    width 1)."""
    import numpy as np

    g = np.asarray(gray, dtype=np.float64)
    h, w = g.shape
    rb = (np.arange(h) * 32 // max(h, 1)).clip(max=31)
    cb = (np.arange(w) * 32 // max(w, 1)).clip(max=31)
    out = np.zeros((32, 32))
    cnt = np.zeros((32, 32))
    np.add.at(out, (rb[:, None].repeat(w, 1), cb[None, :].repeat(h, 0)), g)
    np.add.at(cnt, (rb[:, None].repeat(w, 1), cb[None, :].repeat(h, 0)), 1.0)
    cnt[cnt == 0] = 1.0  # padded bins (input < 32 px): nearest row/col
    out = out / cnt
    # fill empty bins from the nearest populated one (only when h or w < 32)
    if h < 32:
        filled = np.zeros(32, dtype=bool)
        filled[rb] = True
        last = 0
        for r in range(32):
            if filled[r]:
                last = r
            else:
                out[r] = out[last]
    if w < 32:
        filledc = np.zeros(32, dtype=bool)
        filledc[cb] = True
        lastc = 0
        for c in range(32):
            if filledc[c]:
                lastc = c
            else:
                out[:, c] = out[:, lastc]
    return out


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

    Real path: decode (Pillow) -> grayscale -> ``phash_from_pixels``
    (the DCT math itself is implemented and unit-tested HERE, codec or
    not — see test_multimodal.py's pixel-level property tests). Fake
    path, when no decoder exists to produce pixels: the first 16 hex
    chars of the content md5 — NOT perceptual (no near-match behavior),
    but the same 64-bit contract, so the banding / hamming-verify
    plumbing downstream is real and oracle-checkable.
    """
    if HAVE_PIL:  # pragma: no cover - codec not in this container
        import io

        import numpy as np

        with Image.open(io.BytesIO(content)) as img:
            return phash_from_pixels(
                np.asarray(img.convert("L"), dtype="float64")
            )
    return hashlib.md5(content).hexdigest()[:16]


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

    Only the bytes→samples DECODE is codec-gated elsewhere; this math is
    exercised directly by the pixel/sample-level unit tests, codec or
    not.
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
    lo, hi = 1, frame // 2
    edges = np.unique(
        np.floor(lo * (hi / lo) ** (np.arange(n_bands + 1) / n_bands)).astype(int)
    )
    if len(edges) < n_bands + 1:  # tiny frame: fall back to linear edges
        edges = np.linspace(lo, hi, n_bands + 1).astype(int)
    energies = np.add.reduceat(power[:, lo:hi], edges[:-1] - lo, axis=1)
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
