"""Correctness at the 100x replica — the heavy-family differential.

Round 8 proved the method on the two ~linear-growth queries
(``part_bfs_reach`` at lineitem 60M rows, ``image_phash_dup_pairs`` at
500k real PNGs). This round extends the tier to the dedup/similarity
family whose CANDIDATE STRUCTURE changes most with scale — LSH bucket
populations, signature collision rates, posting-list depths:

* ``dedup_exact`` — hash-group over 500k docs;
* ``simhash_dup_pairs`` — banded 64-bit signatures, bucket join;
* ``lsh_candidate_pairs`` — MinHash bands (the gram-list CTE is
  oracle-side ``AS MATERIALIZED``-pinned, the round-7/8 DuckDB
  CTE-inlining family);
* ``bm25_search_topk`` — corpus-wide DF over 500k docs (the query
  terms themselves only match letter-identity replicas — documented,
  the posting aggregation still spans everything);
* ``embedding_topk_cosine`` — 200k x 64 brute-force cosine top-k.

Text decorrelation at 100 replicas needs the WIDE cipher
(tools/bench_scale.py::_cipher_wide — period 130 > 100; the 10x
cipher's 26 rotations would hand every doc 3-4 exact cross-replica
twins and square parts of the pair structure).

Queries whose oracle is INFEASIBLE at this scale are recorded in
``excluded`` with a one-line justification instead of silently
shrinking the family (the 10x artifact's pattern).

Usage: python tools/run_differential_100x.py [out_path] [--resume]
Writes CORRECTNESS_100X.json. Run SERIALLY; the DuckDB side is given
48GB + a spill directory — expect the image oracle to be the long pole
(it rebuilds every pixel of 500k PNGs in SQL).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_process_spark.queries import QUERIES  # noqa: E402
from etl_process_spark.queries.differential import compare  # noqa: E402
from etl_process_spark.session import get_spark  # noqa: E402
from tools.bench_scale import BIG_DIR, build_big_corpus  # noqa: E402

FAMILY = [
    "dedup_exact",
    "embedding_topk_cosine",
    "bm25_search_topk",
    "simhash_dup_pairs",
    "lsh_candidate_pairs",
    "part_bfs_reach",
    "image_phash_dup_pairs",
]

# The CONSIDERED universe at 100x is the heavy family above plus the
# BENCH_SCALE heavy battery (tools/bench_scale.HEAVY). Members whose
# DuckDB oracle is infeasible at this scale are recorded here with a
# one-line justification — machine-readable in the artifact, so "7 of
# 14 considered" is self-describing instead of looking like "nothing
# excluded". Estimates extrapolate from the measured 100x oracle costs
# (simhash 751 s, BFS 601 s, image pHash 1,160 s at 500k docs / 60M
# lineitem) and each family names its 100x-proven representative.
EXCLUDED: dict[str, str] = {
    "allpairs_jaccard_dups": (
        "deliberately-quadratic exact-recall cross-check: the oracle's "
        "prefix-filtered token-set self-join is O(n^2) over 500k docs — "
        "est. >10h DuckDB; exact dedup at 100x is covered by dedup_exact "
        "+ simhash + LSH"),
    "margin_bitext_pairs": (
        "oracle re-scores bidirectional kNN margins with an O(n^2) "
        "200k x 200k cosine self-join in SQL — est. >10h DuckDB; the "
        "embedding family's 100x representative is embedding_topk_cosine"),
    "tokenizer_bpe_deep_merges": (
        "oracle replays every sequential merge round over the 500k-doc "
        "corpus (recursive per-round recount) — est. multi-hour DuckDB; "
        "the delta trainer is cross-checked by its full-recount twin at "
        "10x"),
    "iterative_bpe_merges": (
        "same sequential per-round full-recount oracle over 500k docs — "
        "est. multi-hour DuckDB; 10x-exact"),
    "neardup_method_agreement": (
        "reconciles three dedup methods: its simhash/LSH members are "
        "individually 100x-proven; the combined oracle re-runs all "
        "three incl. the quadratic AllPairs member — est. >10h DuckDB"),
    "copurchase_communities": (
        "label-propagation fixed point: oracle is an iterative "
        "recursive-CTE over the 100x co-purchase edge set — est. >>1h "
        "per round set; the graph family's 100x representative is "
        "part_bfs_reach (601 s oracle, 2M result rows)"),
    "neardup_clusters_star": (
        "alternating-star connected components — same iterative "
        "recursive-CTE oracle class over the 100x candidate-pair graph; "
        "CC-style convergence at 100x is represented by part_bfs_reach"),
}

DUCKDB_PRAGMAS = [
    # Default 48GB, not "most of the box": the oracle shares the
    # machine with a ~48g Spark JVM, and an 80GB cap once got the
    # python process kernel-OOM-killed at 77GB RSS mid-oracle. The
    # spill directory keeps the per-frame DCT rebuild out-of-core.
    # SPARK_GRAFT_ORACLE_MEM overrides the cap: when the DISK is the
    # binding constraint instead (the 500k-image oracle's spill once
    # outran /tmp's free space), a bigger in-memory share is the only
    # lever — raise it only while the Spark side is idle/small.
    f"SET memory_limit='{os.environ.get('SPARK_GRAFT_ORACLE_MEM', '48GB')}'",
    "SET temp_directory='/tmp/duckdb_spill_100x'",
]


def main() -> None:
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = (
        Path(positional[0]).resolve()
        if positional
        else Path(__file__).resolve().parent.parent / "CORRECTNESS_100X.json"
    )
    resume = "--resume" in sys.argv
    # stale temp storage from a killed prior run corrupts later oracle
    # spills (see run_differential_10x.py) — start clean
    import shutil

    shutil.rmtree("/tmp/duckdb_spill_100x", ignore_errors=True)
    spark = get_spark("differential_100x")
    counts = build_big_corpus(spark, BIG_DIR, 100)
    out: dict[str, dict] = {}
    if resume and out_path.exists():
        prior = json.loads(out_path.read_text())["results"]
        out = {k: v for k, v in prior.items()
               if k in FAMILY and v.get("ok")}
        print(f"resume: {len(out)} green kept", flush=True)

    def write_summary() -> dict:
        summary = {
            "sf_dir": BIG_DIR,
            "replicas": 100,
            "table_rows": {t: counts[t] for t in
                           ("documents", "lineitem", "embeddings")},
            "n_queries": len(FAMILY),
            "n_ok": sum(1 for q in FAMILY if out.get(q, {}).get("ok")),
            "n_considered": len(FAMILY) + len(EXCLUDED),
            "excluded": EXCLUDED,
            "note": ("documents decorrelated with the wide cipher "
                     "(period 130 > 100 replicas); embeddings rotation "
                     "period 64 leaves ~36% of vectors one exact "
                     "cross-replica twin (tie-break on id is pinned in "
                     "both engines); bm25 query terms match only "
                     "letter-identity replicas by construction. "
                     "'excluded' enumerates the considered heavy-family "
                     "queries whose ORACLE is infeasible at 100x, each "
                     "with its 100x-proven family representative."),
            # sum of per-query compare times, not wall time since t0:
            # a --resume run would otherwise report ~0 and overwrite
            # the real cost of the runs it kept
            "total_sec": round(sum(r.get("sec", 0) for r in out.values()), 1),
            "results": out,
        }
        out_path.write_text(json.dumps(summary, indent=1) + "\n")
        return summary

    for name in FAMILY:
        if name in EXCLUDED or out.get(name, {}).get("ok"):
            continue
        start = time.time()
        try:
            res = compare(spark, BIG_DIR, QUERIES[name],
                          duckdb_pragmas=DUCKDB_PRAGMAS)
        except Exception as exc:  # noqa: BLE001 — artifact records the failure
            res = {"name": name, "ok": False,
                   "error": f"{type(exc).__name__}: {exc}"[:500]}
        res["sec"] = round(time.time() - start, 1)
        out[name] = res
        print(f"{name}: ok={res.get('ok')} rows={res.get('rows_spark')} "
              f"{res['sec']}s", flush=True)
        # write-through: a kernel OOM on the second oracle must not
        # lose the first query's completed result (it did once)
        write_summary()
    summary = write_summary()
    print(f"wrote {out_path}: {summary['n_ok']}/{summary['n_queries']} ok")


if __name__ == "__main__":
    main()
