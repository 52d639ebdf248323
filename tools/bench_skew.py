"""Skewed-data scale rehearsal (round 5, VERDICT item 3).

The individual skew defenses (salted aggs, AQE skew split, cell_chunks,
capped fan-outs, degree-ordered orientation) are each unit-proven; this
tool COMPOSES them: it synthesizes a deliberately skewed variant of
sf0.1 and runs the heaviest queries against it, asserting no query
degrades more than 2x vs uniform sf0.1 (after a small floor so
sub-second queries don't trip on timer noise).

Skew injected (the three classic shapes):

* documents — one hot token set: 30% of docs get a shared boilerplate
  prefix (stresses AllPairs prefix pruning, SimHash buckets, BPE
  winners); power-law lengths: 2% of docs are repeated 12x (stresses
  per-doc fan-outs and task balance).
* embeddings — one hot IVF cell: 30% of vectors forced into cell 0
  (stresses probed kNN / margin scoring; cell_chunks is the defense).
* lineitem — one hot part key on 30% of rows (turns the co-purchase
  graph's hot node into a super-node; degree-ordered orientation and
  checkpointed rounds are the defenses).

Run serially (bench-contention discipline):
    python tools/bench_skew.py [uniform_sf_dir] [out_json]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

HEAVY = [
    "tokenizer_bpe_deep_merges",
    "iterative_bpe_merges",
    "margin_bitext_pairs",
    "neardup_method_agreement",
    "simhash_dup_pairs",
    "part_bfs_reach",
    "copurchase_communities",
    "allpairs_jaccard_dups",
    "neardup_clusters_star",
    "copurchase_triangles",
    "containment_dup_pairs",
    "embedding_neardup_pairs",
    # round 6: the media matchers. The wav pair reacts to doc-length
    # skew (12x docs -> 12x fingerprint frames each; boilerplate
    # prefixes -> shared words, the df-fence's job — see
    # test_offset_matcher_df_fence_bounds_hot_prefix_buckets for the
    # adversarial-corpus proof); the pHash pair's pixel corpora derive
    # from doc_id only, pinning that text skew can't leak into them.
    "wav_fingerprint_offset_pairs",
    "wav_fingerprint_dup_pairs",
    "image_phash_dup_pairs",
    "video_phash_dup_pairs",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

BOILER = (
    "common boilerplate header the crawler kept on every mirrored page "
    "terms conditions navigation copyright "
)

FLOOR = 0.75   # seconds added to both sides: timer-noise floor
LIMIT = 2.0    # max allowed skewed/uniform ratio


def synthesize_skew(spark, src: str, dst: str) -> None:
    from pyspark.sql import functions as F

    Path(dst).mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 50 == 0, F.repeat(F.col("text"), 12))
                .when(
                    F.col("doc_id") % 10 < 3,
                    F.concat(F.lit(BOILER), F.col("text")),
                )
                .otherwise(F.col("text")),
            )
        elif t == "embeddings":
            df = df.withColumn(
                "label",
                F.when(F.col("vec_id") % 10 < 3, F.lit(0)).otherwise(
                    F.col("label")
                ),
            )
        elif t == "lineitem":
            hot = df.groupBy("l_partkey").count().orderBy(
                F.col("count").desc(), F.col("l_partkey")
            ).first()["l_partkey"]
            df = df.withColumn(
                "l_partkey",
                F.when(F.col("l_orderkey") % 10 < 3, F.lit(hot)).otherwise(
                    F.col("l_partkey")
                ),
            )
        df.coalesce(4).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")


def run_corpus(spark, queries, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for name in HEAVY:
        t0 = time.time()
        n = queries[name].builder(spark, sf_dir).count()
        times[name] = round(time.time() - t0, 3)
        assert n >= 0
    return times


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from etl_process_spark.queries import QUERIES
    from etl_process_spark.session import get_spark

    uniform = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_skew.json"
    skew_dir = "/tmp/spark_graft_skew_sf01"

    spark = get_spark("bench-skew")
    shutil.rmtree(skew_dir, ignore_errors=True)
    synthesize_skew(spark, uniform, skew_dir)

    # warm the JVM/codegen caches once so neither side pays first-run cost
    QUERIES[HEAVY[0]].builder(spark, uniform).count()

    t_uniform = run_corpus(spark, QUERIES, uniform)
    t_skew = run_corpus(spark, QUERIES, skew_dir)

    report = {}
    worst = ("", 0.0)
    for name in HEAVY:
        ratio = (t_skew[name] + FLOOR) / (t_uniform[name] + FLOOR)
        report[name] = {
            "uniform_s": t_uniform[name],
            "skewed_s": t_skew[name],
            "ratio": round(ratio, 3),
        }
        if ratio > worst[1]:
            worst = (name, ratio)
    out = {
        "uniform_dir": uniform,
        "skew_dir": skew_dir,
        "floor_s": FLOOR,
        "limit": LIMIT,
        "worst": {"query": worst[0], "ratio": round(worst[1], 3)},
        "queries": report,
    }
    Path(out_path).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    offenders = [n for n, r in report.items() if r["ratio"] > LIMIT]
    assert not offenders, (
        f"skew degraded {offenders} beyond {LIMIT}x: {report}"
    )


if __name__ == "__main__":
    main()
