"""Independent pure-Python references for oracle-replayed formulations.

Several operators' DuckDB oracles REPLAY the same formulation the Spark
builder uses (simhash bit votes, kNN fixed-point scoring) — a shared
formulation bug would sail through the differential. These tests
recompute the contracts from scratch in plain Python (hashlib md5,
float64 loops in the documented accumulation order) and require exact
agreement on real testdata samples.
"""

from __future__ import annotations

import hashlib
import math
import re

import pyspark.sql.functions as F

from etl_process_spark.operators import dedup as dd
from etl_process_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.01"

NIBBLE_BIT_CHARS = ("89abcdef", "4567cdef", "2367abef", "13579bdf")


def _py_simhash_bands(text: str) -> list[int]:
    toks = re.split(r"\s+", text.strip().lower())
    votes = [0] * 64
    for tok in toks:
        h = hashlib.md5(tok.encode("utf-8")).hexdigest()
        for i in range(64):
            hit = h[i // 4] in NIBBLE_BIT_CHARS[i % 4]
            votes[i] += 1 if hit else -1
    bands = []
    for b in range(4):
        val = 0
        for i in range(16 * b, 16 * b + 16):
            val = (val << 1) | (1 if votes[i] > 0 else 0)
        bands.append(val)
    return bands


def test_simhash_signatures_match_python_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    got = {
        r["doc"]: list(r["shs"])
        for r in dd.simhash_signatures(docs, "text", "doc_id").collect()
    }
    for row in docs.select("doc_id", "text").collect():
        assert got[row["doc_id"]] == _py_simhash_bands(row["text"]), row[
            "doc_id"
        ]


def _py_cos_e6(a: list[float], b: list[float]) -> int:
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        x = float(x)
        y = float(y)
        dot = dot + x * y
        na = na + x * x
        nb = nb + y * y
    return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000.0)


def test_knn_bruteforce_matches_python_reference(spark):
    """knn_join (nprobe=None, brute force) against a float64 Python loop
    in the documented left-associated order: same neighbor ids, same e6
    scores, same ranks with the (score desc, id asc) tie-break."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.limit(60)
    queries = emb.filter(F.col("vec_id") % 7 == 0).limit(10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = {}
    for r in sim.knn_join(corpus, queries, k=3, nprobe=None).collect():
        got.setdefault(r["qid"], []).append(
            (r["rn"], r["vec_id"], r["cos_sim_e6"])
        )
    corpus_rows = [
        (r["vec_id"], list(r["embedding"]))
        for r in corpus.select("vec_id", "embedding").collect()
    ]
    for q in queries.collect():
        scored = sorted(
            (
                (-_py_cos_e6(vec, list(q["qvec"])), vid)
                for vid, vec in corpus_rows
            ),
        )[:3]
        want = [
            (rank, vid, -neg)
            for rank, (neg, vid) in enumerate(scored, start=1)
        ]
        assert sorted(got[q["qid"]]) == want, q["qid"]


def _py_minhash(text: str, num_hashes: int = 4, k: int = 3):
    toks = re.split(r"\s+", text.strip().lower())
    shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return None
    step = 32 // num_hashes
    digests = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in shingles]
    out = []
    for s in range(num_hashes):
        r = s * step
        out.append(min(h[r:] + h[:r] for h in digests))
    return out


def test_minhash_signatures_match_python_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    got = {
        r["doc_id"]: [r[f"minhash_{s}"] for s in range(4)]
        for r in dd.minhash_signatures_df(docs, "text", "doc_id").collect()
    }
    for row in docs.select("doc_id", "text").collect():
        want = _py_minhash(row["text"])
        if want is None:
            assert row["doc_id"] not in got  # < k tokens: absent by contract
        else:
            assert got[row["doc_id"]] == want, row["doc_id"]
