"""pHash oracle robustness audit.

The image_phash_dup_pairs oracle rebuilds the 64 DCT sign bits in SQL.
Every stage before the DCT is exact-integer or single-IEEE-op (pooled
bin means: exact integer sum / exact count), so the ONLY cross-engine
noise is the DCT basis product: DuckDB's cos/summation order vs numpy's
can differ by ~1e-13 in absolute coefficient value. A sign bit could
therefore only flip if some |coef − median| were comparably tiny.

This tool computes, for EVERY image group in a corpus, the minimum
|coef − median| over the 63 AC coefficients (excluding the median
element itself, which is exactly 0 away and compares False in both
engines by strict >), and reports the corpus-wide minimum margin. A
margin of ~1e-2 or more means the oracle has ≥10 orders of magnitude of
headroom over engine noise.

Usage: python tools/phash_margin_check.py [sf_dir ...]
"""

from __future__ import annotations

import sys

import numpy as np


def margins_for_sf(sf_dir: str) -> tuple[float, int]:
    import duckdb

    from etl_process_spark.multimodal.assets import image_group, image_pixels
    from etl_process_spark.multimodal.codecs import (
        _area_resize_32,
        _dct_matrix,
        phash_from_pixels,
    )

    doc_ids = (
        duckdb.sql(f"SELECT doc_id FROM '{sf_dir}/documents.parquet'")
        .df()["doc_id"]
        .astype(int)
        .tolist()
    )
    gids = sorted({image_group(d) for d in doc_ids})
    m = _dct_matrix(32)
    worst = float("inf")
    for gid in gids:
        base = image_pixels(gid).astype(np.float64)
        for px in (base, 2.0 * base + 1.0):   # base AND the odd twin
            g32 = _area_resize_32(px)
            block = (m @ g32 @ m.T)[:8, :8].reshape(64)
            ac = block[1:]
            med = float(np.median(ac))
            gaps = np.abs(block - med)
            gaps[0] = np.inf                   # DC bit is pinned, not compared
            gaps[gaps == 0.0] = np.inf         # the median element itself
            worst = min(worst, float(gaps.min()))
        # the oracle assigns ONE hash per group — affine invariance must
        # hold not just in theory but on these exact floats
        assert phash_from_pixels(base) == phash_from_pixels(2.0 * base + 1.0), gid
    return worst, len(gids)


def frame_margins_for_sf(sf_dir: str) -> tuple[float, int]:
    """Same audit for the paired-VIDEO corpus: every frame of every
    group (video_phash_dup_pairs rebuilds per-frame sign bits in SQL)."""
    import duckdb

    from etl_process_spark.multimodal.assets import (
        image_group,
        paired_frame_pixels,
        paired_video_shape,
    )
    from etl_process_spark.multimodal.codecs import (
        _area_resize_32,
        _dct_matrix,
        phash_from_pixels,
    )

    doc_ids = (
        duckdb.sql(f"SELECT doc_id FROM '{sf_dir}/documents.parquet'")
        .df()["doc_id"]
        .astype(int)
        .tolist()
    )
    gids = sorted({image_group(d) for d in doc_ids})
    m = _dct_matrix(32)
    worst = float("inf")
    n_frames = 0
    for gid in gids:
        nf, _s = paired_video_shape(gid)
        for f in range(nf):
            base = paired_frame_pixels(gid, f).astype(np.float64)
            g32 = _area_resize_32(base)
            block = (m @ g32 @ m.T)[:8, :8].reshape(64)
            med = float(np.median(block[1:]))
            gaps = np.abs(block - med)
            gaps[0] = np.inf
            gaps[gaps == 0.0] = np.inf
            worst = min(worst, float(gaps.min()))
            n_frames += 1
            assert phash_from_pixels(base) == phash_from_pixels(
                2.0 * base + 1.0
            ), (gid, f)
    return worst, n_frames


def main() -> None:
    sys.path.insert(0, "/root/repo")
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    for sf_dir in dirs:
        worst, n = margins_for_sf(sf_dir)
        print(
            f"{sf_dir}: {n} image groups, min |coef - median| = {worst:.6g} "
            f"({worst / 1e-13:.1e}x the ~1e-13 cross-engine noise floor)"
        )
        assert worst > 1e-6, (
            f"{sf_dir}: margin {worst} too small — a DCT sign bit could "
            "diverge between engines; change the pixel rule"
        )
        fworst, nf = frame_margins_for_sf(sf_dir)
        print(
            f"{sf_dir}: {nf} video frames, min |coef - median| = {fworst:.6g} "
            f"({fworst / 1e-13:.1e}x the ~1e-13 cross-engine noise floor)"
        )
        assert fworst > 1e-6, (
            f"{sf_dir}: frame margin {fworst} too small — a DCT sign bit "
            "could diverge between engines; change the frame pixel rule"
        )


if __name__ == "__main__":
    main()
