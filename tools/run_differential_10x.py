"""Correctness at the 10x decorrelated replica: the dedup/similarity
family's DuckDB differential re-run on the scale corpus.

BENCH_SCALE.json proves the heavy queries' wall time grows sub-linearly
to the 10x replica; this tool closes the remaining gap — proving they
stay EXACT there, not just fast. The oracle needs no porting: the
replica directory carries the same ten tables, so DuckDB computes the
ground truth directly on the replicated parquet (the one mechanical
difference — Spark writes table DIRECTORIES where the driver testdata
ships single files — is handled inside ``duckdb_connection``).

Scope: the dedup / near-dup / similarity-search operators, whose
correctness claims lean hardest on candidate-generation structure
(LSH bands, SimHash buckets, prefix filters, IVF cells) that the
decorrelated replica deliberately re-keys. A banding bug that only
manifests when bucket populations grow 10x would pass sf0.1 and fail
here.

Usage: python tools/run_differential_10x.py [out_path] [query ...]
(default out: CORRECTNESS_10X.json; naming queries re-runs only those
and merges into the existing artifact). Run SERIALLY — the documented
contention trap applies to the Spark timings embedded in the artifact.

The oracle connection gets a memory cap + spill directory: DuckDB's
in-memory default has no temp dir, so the heaviest oracles (the exact
all-pairs Jaccard verify) OOM at 50k docs instead of going out-of-core.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_process_spark.queries import QUERIES  # noqa: E402
from etl_process_spark.queries.differential import compare  # noqa: E402
from etl_process_spark.session import get_spark  # noqa: E402
from tools.bench_scale import OUT_DIR, build_scaled_corpus  # noqa: E402

# the dedup / near-dup / similarity family (SURVEY.md LLM-data operators),
# extended with the other bucketed/banded/iterative operators whose scale
# claims lean on candidate-generation structure: media near-dup matchers
# (pHash/fingerprint LSH over REAL codecs), iterative graph, the
# gap-session batch twins, ranked retrieval, sketches, and BPE training
FAMILY = [
    "dedup_exact",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "neardup_clusters",
    "neardup_clusters_star",
    "allpairs_jaccard_dups",
    "ngram_jaccard_pairs",
    "simhash_dup_pairs",
    "containment_dup_pairs",
    "substring_dedup_spans",
    "eval_decontamination",
    "semantic_dedup_keep",
    "kmeans_embedding_clusters",
    "embedding_topk_cosine",
    "embedding_neardup_pairs",
    "knn_join_probed",
    "margin_bitext_pairs",
    # media (one asset per document: 50k PNGs / WAVs / packed-PNG videos
    # decoded end-to-end on BOTH engines)
    "image_decode_stats",
    "image_phash_dup_pairs",
    "wav_fingerprint_dup_pairs",
    "wav_fingerprint_offset_pairs",
    "video_phash_dup_pairs",
    # iterative graph over the 6M-row lineitem co-purchase basket
    "copurchase_triangles",
    "copurchase_communities",
    "part_bfs_reach",
    # gap-session batch twins (the oracles behind the TWS trio)
    "sessionize_batch_twin",
    "session_type_profile",
    "session_trace_summary",
    # retrieval / sketches / BPE
    "bm25_search_topk",
    "bloom_dedup_probe",
    "heavy_hitter_order_groups",
    "iterative_bpe_merges",
]


DUCKDB_PRAGMAS = [
    "SET memory_limit='48GB'",
    "SET temp_directory='/tmp/duckdb_spill_10x'",
]


def main() -> None:
    out_path = (
        Path(sys.argv[1]).resolve()
        if len(sys.argv) > 1
        else Path(__file__).resolve().parent.parent / "CORRECTNESS_10X.json"
    )
    subset = sys.argv[2:]
    spark = get_spark("differential_10x")
    counts = build_scaled_corpus(spark, OUT_DIR, 10)
    out: dict[str, dict] = {}
    if subset and out_path.exists():
        out = json.loads(out_path.read_text())["results"]
    t0 = time.time()
    for name in subset or FAMILY:
        start = time.time()
        try:
            res = compare(spark, OUT_DIR, QUERIES[name],
                          duckdb_pragmas=DUCKDB_PRAGMAS)
        except Exception as exc:  # noqa: BLE001 — artifact records the failure
            res = {"name": name, "ok": False, "error": f"{type(exc).__name__}: {exc}"}
        res["sec"] = round(time.time() - start, 1)
        out[name] = res
        print(f"{name}: ok={res.get('ok')} rows={res.get('rows_spark')} "
              f"{res['sec']}s", flush=True)
    summary = {
        "sf_dir": OUT_DIR,
        "replicas": 10,
        "table_rows": {t: counts[t] for t in ("documents", "embeddings")},
        "n_queries": len(FAMILY),
        "n_ok": sum(1 for r in out.values() if r.get("ok")),
        "total_sec": round(time.time() - t0, 1),
        "results": out,
    }
    out_path.write_text(json.dumps(summary, indent=1) + "\n")
    print(f"wrote {out_path}: {summary['n_ok']}/{summary['n_queries']} ok")


if __name__ == "__main__":
    main()
