"""Pure-stdlib WAV (RIFF PCM) codec via the ``wave`` module.

16-bit signed little-endian mono PCM — the lossless container the
synthetic audio corpus uses, so bytes → samples decode is EXACT: every
feature downstream (mean amplitude, RMS, Haitsma–Kalker fingerprint)
runs on the true sample values, and the DuckDB oracle recomputes them
from the same integer synthesis rule.
"""

from __future__ import annotations

import io
import wave

import numpy as np

WAV_MAGIC = b"RIFF"


def encode_wav(samples, rate: int = 8000) -> bytes:
    """Encode an int16 sample array as mono 16-bit PCM WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes → (int64 sample array, frame rate).

    Mono 16-bit and mono 8-bit PCM are accepted (8-bit WAV is unsigned
    per spec and is re-centered to signed). Anything else — stereo,
    24-bit, float — raises rather than mis-decoding.
    """
    with wave.open(io.BytesIO(content), "rb") as w:
        nch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        if nch != 1 or width not in (1, 2):
            raise ValueError(
                f"unsupported WAV profile (channels={nch} sampwidth={width}); "
                "corpus profile is mono 8/16-bit PCM"
            )
        frames = w.readframes(w.getnframes())
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.int64)
    else:
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.int64) - 128
    return samples, rate


def is_wav(content: bytes) -> bool:
    return (
        len(content) >= 12
        and content[:4] == WAV_MAGIC
        and content[8:12] == b"WAVE"
    )


def wav_header_meta(content: bytes) -> tuple[int, int, int]:
    """(n_samples, rate, sampwidth) read from the header only — the
    metadata-without-decode path (ingest-time meta population)."""
    with wave.open(io.BytesIO(content), "rb") as w:
        return w.getnframes(), w.getframerate(), w.getsampwidth()
