"""Pure-stdlib PNG codec (zlib inflate/deflate + scanline filters).

The container ships no Pillow/ffmpeg, but PNG itself needs nothing
beyond ``zlib`` (RFC 1950/1951) and byte arithmetic: a PNG is a
signature, an IHDR chunk, one zlib stream of filter-prefixed scanlines
in IDAT chunk(s), and IEND. This module implements that spec subset —
8-bit grayscale (color type 0) and 8-bit RGB (color type 2), all five
scanline filter types (None/Sub/Up/Average/Paeth, incl. the spec's
floor-average and Paeth tie-break rules) — which is everything the
synthetic asset corpus and the perceptual-hash pipeline need.

This replaces the round-≤4 md5 stand-in for the test corpus: decode is
REAL (bytes → pixels), so pHash / luma stats run end-to-end on actual
image content. Round-trip exactness (encode → decode == pixels) is
pinned by unit tests against hand-computed fixtures and across every
filter type.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Per-spec Paeth predictor, vectorized: nearest of (left, up,
    up-left) to p = a + b − c, ties resolved a, then b, then c."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(pixels: np.ndarray, filter_type: int | str = "cycle") -> bytes:
    """Encode a (h, w) uint8 grayscale or (h, w, 3) uint8 RGB array.

    ``filter_type``: a fixed filter 0–4 for every scanline, or
    ``"cycle"`` (default) to use filter ``row % 5`` — which makes every
    encoded corpus image exercise all five un-filter paths of any
    standards-compliant decoder, ours included.
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, channels = 0, 1
        h, w = px.shape
        px = px[:, :, None]
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = px.shape[:2]
    else:
        raise ValueError(f"expected (h,w) gray or (h,w,3) rgb, got {px.shape}")

    raw = bytearray()
    prev = np.zeros((w, channels), dtype=np.uint8)
    for r in range(h):
        row = px[r]
        ft = (r % 5) if filter_type == "cycle" else int(filter_type)
        left = np.vstack([np.zeros((1, channels), np.uint8), row[:-1]])
        upleft = np.vstack([np.zeros((1, channels), np.uint8), prev[:-1]])
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = (row.astype(np.int16) - left).astype(np.uint8)
        elif ft == 2:
            enc = (row.astype(np.int16) - prev).astype(np.uint8)
        elif ft == 3:
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            enc = (row.astype(np.int16) - avg).astype(np.uint8)
        elif ft == 4:
            enc = (row.astype(np.int16) - _paeth(left, prev, upleft)).astype(
                np.uint8
            )
        else:
            raise ValueError(f"bad filter type {ft}")
        raw.append(ft)
        raw.extend(enc.tobytes())
        prev = row

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode PNG bytes → (width, height, channels, pixels uint8).

    Pixels come back as (h, w) for grayscale, (h, w, 3) for RGB.
    Supports bit depth 8, color types 0 and 2, no interlace — the
    profile ``encode_png`` emits (and rejects everything else loudly
    rather than mis-decoding).
    """
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or ctype not in (0, 2) or comp or filt or ilace:
                raise ValueError(
                    f"unsupported PNG profile (depth={depth} color={ctype} "
                    f"interlace={ilace}); encoder profile is 8-bit gray/rgb"
                )
            channels = 1 if ctype == 0 else 3
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")

    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((height, width, channels), dtype=np.uint8)
    prev = np.zeros((width, channels), dtype=np.uint8)
    for r in range(height):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).reshape(width, channels)
        if ft == 0:
            row = line.copy()
        elif ft == 2:
            row = line + prev  # uint8 wraps mod 256, per spec
        elif ft == 1:
            # Sub is a running sum along the scanline — mod-256 cumsum
            row = (np.cumsum(line.astype(np.int64), axis=0) % 256).astype(
                np.uint8
            )
        elif ft in (3, 4):
            # left-dependent filters are sequential along the scanline —
            # a plain-int loop beats per-pixel numpy scalars ~5-10x (the
            # decode hotspot for a corpus-sized pass)
            rawl = line.reshape(-1).tolist()
            prevl = prev.reshape(-1).tolist()
            ch = channels
            cur = [0] * stride
            if ft == 3:
                for i in range(stride):
                    a = cur[i - ch] if i >= ch else 0
                    cur[i] = (rawl[i] + ((a + prevl[i]) >> 1)) & 0xFF
            else:
                for i in range(stride):
                    a = cur[i - ch] if i >= ch else 0
                    b = prevl[i]
                    c = prevl[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    cur[i] = (rawl[i] + pred) & 0xFF
            row = np.array(cur, dtype=np.uint8).reshape(width, channels)
        else:
            raise ValueError(f"bad PNG filter byte {ft}")
        out[r] = row
        prev = row
    return width, height, channels, (out[:, :, 0] if channels == 1 else out)
