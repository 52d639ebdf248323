"""Audio-fingerprint oracle robustness audit (the WAV twin of
phash_margin_check.py).

The wav_fingerprint_words oracle rebuilds the Haitsma–Kalker sign bits
in SQL. The sample values and band edges are exact integers; the only
floating stages are the DFT products and energy sums, where DuckDB's
cos/sin and summation order can differ from numpy's by ~1e-13 RELATIVE.
A sign bit flips only if some difference-of-differences |dd| is
comparable to that noise, i.e. |dd| / E_scale ≈ 1e-13.

This tool computes every |dd| across a corpus alongside the frame's
band-energy scale and reports the minimum RELATIVE margin. Margins of
1e-6+ mean ≥7 orders of magnitude of headroom.

Usage: python tools/fingerprint_margin_check.py [sf_dir ...]
"""

from __future__ import annotations

import sys

import numpy as np


def margins_for_sf(sf_dir: str, frame: int = 128, hop: int = 128,
                   n_bands: int = 33) -> tuple[float, int, int]:
    import duckdb

    from etl_process_spark.multimodal.codecs import band_edges

    texts = (
        duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet' "
            f"WHERE length(text) >= {2 * frame}"
        )
        .df()["text"]
        .tolist()
    )
    edges = band_edges(frame, n_bands)
    worst_rel = float("inf")
    n_bits = 0
    for text in texts:
        x = (
            np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(
                np.float64
            )
            - 128.0
        )
        n_frames = 1 + (x.size - frame) // hop
        idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
        frames = x[idx]
        k = np.arange(frame // 2 + 1)[:, None]
        t = np.arange(frame)[None, :]
        ang = 2.0 * np.pi * k * t / frame
        power = (frames @ np.cos(ang).T) ** 2 + (frames @ np.sin(ang).T) ** 2
        energies = np.add.reduceat(power[:, 1 : frame // 2], edges[:-1] - 1,
                                   axis=1)
        d = energies[:, :-1] - energies[:, 1:]
        dd = d[1:] - d[:-1]
        scale = np.abs(energies[1:, :-1]).max(axis=1, keepdims=True)
        scale[scale == 0] = 1.0
        # exact-zero dd would be a hazard of its own (numpy's identical-
        # frame arithmetic gives exactly 0.0 -> bit False, while DuckDB's
        # per-group summation order could give ±1e-13 -> bit arbitrary),
        # so refuse it outright rather than excluding it from the margin
        assert not (dd == 0).any(), (
            "exact-zero dd encountered — identical adjacent frames make "
            "the sign bit engine-dependent; change frame/hop or corpus"
        )
        rel = np.abs(dd) / scale
        worst_rel = min(worst_rel, float(rel.min()))
        n_bits += dd.size
        # the paired-audio corpus assigns the BASE fingerprint to the
        # amplitude-doubled twin — invariance must hold on these exact
        # floats, not just in theory
        from etl_process_spark.multimodal.codecs import (
            audio_fingerprint_from_samples,
        )

        assert audio_fingerprint_from_samples(
            x, frame=frame, hop=hop, n_bands=n_bands
        ) == audio_fingerprint_from_samples(
            2.0 * x, frame=frame, hop=hop, n_bands=n_bands
        )
    return worst_rel, len(texts), n_bits


def main() -> None:
    sys.path.insert(0, "/root/repo")
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    # hop=128: wav_fingerprint_words/_dup_pairs; hop=32: the overlapping-
    # frame configuration of wav_fingerprint_offset_pairs (4x the frames,
    # same exactness requirements). The twins' whole-hop SHIFT adds no
    # float surface — shifted windows are sample-identical to the base's.
    for sf_dir in dirs:
        for hop in (128, 32):
            worst, n_docs, n_bits = margins_for_sf(sf_dir, hop=hop)
            print(
                f"{sf_dir} (hop={hop}): {n_docs} qualifying docs, "
                f"{n_bits} sign bits, min relative |dd| margin = {worst:.6g} "
                f"({worst / 1e-13:.1e}x the ~1e-13 noise floor)"
            )
            assert worst > 1e-9, (
                f"{sf_dir} hop={hop}: relative margin {worst} too small — "
                "a fingerprint sign bit could diverge between engines"
            )


if __name__ == "__main__":
    main()
