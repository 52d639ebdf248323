"""Write PLANS.md: physical-plan evidence for the headline queries.

One section per representative query covering each scale pattern the
engine claims (pushdown, pruning, broadcast choice, single-shuffle
aggregation, TakeOrderedAndProject top-k, packed-broadcast map stages,
iterative broadcast rounds). For each: the machine-extracted plan
signals (PushedFilters / ReadSchema / operator counts) plus the final
physical operator tree — the artifact a reviewer reads instead of
re-running .explain() per query.

Usage: python tools/dump_plans.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_process_spark.plans.audit import (  # noqa: E402
    broadcast_join_count,
    codegen_span_count,
    exchange_count,
    explain_str,
    has_cartesian,
    pushed_filters,
    python_stage_count,
    read_schemas,
)
from etl_process_spark.queries import QUERIES  # noqa: E402
from etl_process_spark.session import get_spark  # noqa: E402

# (query, the load-bearing plan property a reviewer should check)
SHOWCASE: list[tuple[str, str]] = [
    ("pricing_summary", "all predicates pushed to the parquet scan; one partial-agg shuffle (map-side combine)"),
    ("filtered_projection", "filter + projection reach the scan: PushedFilters populated, ReadSchema pruned to the selected columns"),
    ("top_revenue_orders", "global ORDER BY + LIMIT plans as TakeOrderedAndProject — no total sort at any scale"),
    ("dedup_exact", "corpus-wide exact dedup is ONE hash-agg shuffle on the md5 fingerprint"),
    ("brand_size_disjunction", "OR-of-ANDs spanning both join sides: CNF residue pushed into BOTH parquet scans"),
    ("customers_outside_regions", "NOT IN plans as a null-aware anti join (isNullAware=true), not a cartesian"),
    ("lsh_candidate_pairs", "banded minhash bucket join — candidates explode only within buckets, never all-pairs"),
    ("embedding_topk_cosine", "brute-force baseline still avoids the global sort: TakeOrderedAndProject top-k"),
    ("ivf_search_topk", "IVF probe: centroid broadcast + cell-restricted candidate scan (semi-join), corpus never cross-joined"),
    ("kmeans_embedding_clusters", "assignment is a packed-centroid BroadcastNestedLoopJoin map stage; updates are centroid-sized aggs"),
    ("embedding_zscore_apply", "stats pack into ONE broadcast row; per-vector transform folds in codegen — no vector shuffle on apply"),
    ("dsir_importance_weights", "corpus exploded+shuffled exactly once; 256-row model broadcast back"),
    ("part_pagerank", "iterative rounds keep rank/contribution tables broadcast; O(|E|) rows never shuffle-joined"),
    ("packed_training_sequences_sharded", "k-way packing reuses the window's (lang, shard) partitioning — whole query is one exchange"),
    ("orders_table_checksum", "commutative fingerprint: one scan into a 1-row aggregate, all partials map-side"),
    ("salted_hot_key_join", "hot-key lanes: fact sharded, dim replicated — skew never lands on one reducer"),
    ("image_decode_stats", "declared Python stages only: Arrow-batched mapInPandas synthesis + REAL PNG decode, everything after is JVM"),
    ("image_phash_dup_pairs", "real-decode pHash near-dup, decode-once: the digest table is localCheckpoint-materialized after ONE decode pass (every branch scans the same RDD); candidates from a (band, code) equi-join, integer popcount verify in codegen"),
    ("wav_fingerprint_words", "real WAV decode -> framed DFT fingerprint entirely inside one mapInPandas stage; only (asset_id, word_idx, word) integers cross Arrow — no audio bytes in any exchange"),
    ("wav_fingerprint_offset_pairs", "offset-invariant audio matcher, decode-once (checkpointed word stream): word-alone buckets after a df<=32 stop-word fence, modal-offset vote as one agg + one window — never all-pairs"),
    ("video_phash_dup_pairs", "per-frame pHash video near-dup, decode-once: ONE container walk emits (asset, frame, digest) into a checkpointed table; frame-level (band, code) LSH join + popcount verify + temporal vote, all JVM-side"),
    ("allpairs_jaccard_dups", "complete Jaccard join: candidates from a prefix-only equi-join (rarest-first order), dictionary-encoded verify"),
    ("weekly_distinct_rollup_hll", "COUNT DISTINCT lattice: weekly estimates merge DAILY sketches — raw events never re-scanned per grain"),
    ("trending_types_per_window", "rank window reuses the counts aggregate's partitioning — top-k adds no corpus-sized exchange"),
    ("simhash_dup_pairs", "64-bit signature entirely in codegen (explode → one md5/token → conv → 64 bit-tally partial-agg sums); 2^16 buckets/band keep in-bucket pairs selective, verify is integer popcount"),
    ("margin_bitext_pairs", "declared vectorized-UDF fast path: FlatMapCoGroupsInPandas scores cell blocks (vectors cross Arrow once per probed cell, never per pair); each direction referenced once via the bounded collect_list pass"),
    ("tokenizer_bpe_apply", "tokenizer train+encode as one lazy plan: per round one (pair,count) partial-agg shuffle + a 1-row winner broadcast into a per-row rewrite; the only doc-keyed exchange is the final agg"),
]


def _tree(df) -> str:
    """The `== Physical Plan ==` operator tree from formatted explain,
    indented node list only (details section dropped for brevity)."""
    plan = explain_str(df)
    body = plan.split("== Physical Plan ==", 1)[-1]
    tree = body.split("\n\n", 1)[0].strip("\n")
    # strip codegen ids for stability across runs
    return re.sub(r" \(\d+\)", "", tree)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("dump_plans")
    out: list[str] = [
        "# PLANS — physical-plan evidence for the headline queries",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}` "
        "(re-run after plan-affecting changes; "
        "`tests/test_plans.py` machine-checks the same properties).",
        "",
    ]
    for name, claim in SHOWCASE:
        df = QUERIES[name].builder(spark, sf_dir)
        pf = pushed_filters(df)
        rs = read_schemas(df)
        out += [
            f"## {name}",
            "",
            f"**Claim:** {claim}",
            "",
            f"- exchanges: {exchange_count(df)}, broadcast joins: "
            f"{broadcast_join_count(df)}, codegen spans: "
            f"{codegen_span_count(df)}, python stages: "
            f"{python_stage_count(df)}, cartesian: {has_cartesian(df)}",
        ]
        if pf:
            out.append(f"- PushedFilters: {'; '.join(pf[:4])}")
        if rs:
            out.append(f"- ReadSchema: {'; '.join(rs[:4])}")
        out += ["", "```", _tree(df), "```", ""]
    path = Path(__file__).resolve().parent.parent / "PLANS.md"
    path.write_text("\n".join(out) + "\n")
    print(f"wrote {path} ({len(SHOWCASE)} queries)")


if __name__ == "__main__":
    main()
