"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the 100 TB contract):

* Signatures (minhash / simhash / fingerprints) are per-row expressions —
  higher-order SQL functions over token arrays, JVM codegen, no shuffle.
* Candidate generation never compares all pairs: MinHash-LSH buckets docs
  by banded signature and only docs sharing a bucket are joined — the
  shuffle is on band keys, and the join explodes only within buckets.
* Verification (exact Jaccard) runs only on LSH candidates, via a
  shingle-level equi join — O(candidate pairs × shingles), not O(n²).
* The md5 hash family keeps every stage reproducible across engines (the
  DuckDB oracle computes identical values); see operators/text.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_process_spark.operators.text import tokens


def shingles(text: Column | str, k: int = 3) -> Column:
    """Word k-shingles of the canonical token stream.

    Empty array when the document has fewer than k tokens (guarded — Spark's
    sequence() would otherwise generate a descending range).
    """
    t = tokens(text)
    n = F.size(t)
    idx = F.sequence(F.lit(1), n - (k - 1))
    make = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(k)])
    )
    return F.when(n >= k, make).otherwise(F.array().cast("array<string>"))


def minhash_signature(text: Column | str, num_hashes: int = 4, k: int = 3) -> list[Column]:
    """MinHash signature: per seed s, min over shingles of md5('s|'+shingle).

    Lexicographic min over md5 hex strings is a valid min-wise hash family
    substitute and is bit-identical across engines. Returns one Column per
    seed, NULL for documents with < k tokens.
    """
    sh = shingles(text, k)

    def one(seed: int) -> Column:
        # NB: the lambda must take exactly one arg — a two-parameter lambda
        # (e.g. `lambda x, s=s`) is treated by pyspark as (element, index).
        prefix = f"{seed}|"
        return F.array_min(
            F.transform(sh, lambda x: F.md5(F.concat(F.lit(prefix), x)))
        ).alias(f"minhash_{seed}")

    return [one(s) for s in range(num_hashes)]


def simhash16(text: Column | str) -> Column:
    """16-bit SimHash over unigram tokens, md5-derived bit planes.

    Bit b (1..16) of a token = high bit of hex nibble b of md5(token).
    Per-document bit = sign of the sum of ±1 contributions. Entirely
    per-row; the expression stays in whole-stage codegen.
    """
    t = tokens(text)
    # Fold MSB-first: acc*2 + bit_b over b=1..16 == Σ bit_b << (16-b).
    # A hex nibble's high bit is set iff the character sorts >= '8'
    # ('0'..'9' < 'a'..'f' in both engines' byte order).
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(16)),
        F.lit(0),
        lambda acc, b: acc * 2
        + F.when(
            F.aggregate(
                t,
                F.lit(0),
                lambda a, tok: a
                + F.when(F.md5(tok).substr(b, F.lit(1)) >= F.lit("8"), F.lit(1)).otherwise(
                    F.lit(-1)
                ),
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup via hash-groupBy: one keeper (min id) per distinct text.

    Grouping on the md5 fingerprint rather than the full text keeps shuffle
    rows small (16 bytes vs document bytes) — at 100 TB this is the
    difference between shuffling hashes and shuffling the corpus.
    """
    from etl_process_spark.operators.text import fingerprint

    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def lsh_candidate_pairs(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 4, band_size: int = 2,
    k: int = 3,
) -> DataFrame:
    """MinHash-LSH candidate pairs: band the signature, bucket-join.

    shingle -> minhash -> band -> bucket join (the classic pipeline). Docs
    sharing any band bucket become a candidate pair exactly once
    (DISTINCT over pairs). The self-join shuffles on the band key only;
    band keys are md5 strings so bucket skew tracks true near-dup density.
    """
    sigs = df.select(F.col(id_col).alias("doc"), *minhash_signature(F.col(text_col), num_hashes, k))
    bands = []
    for b0 in range(0, num_hashes, band_size):
        cols = [f"minhash_{s}" for s in range(b0, min(b0 + band_size, num_hashes))]
        bands.append(
            sigs.select(
                "doc",
                F.lit(b0 // band_size).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("bucket"),
            ).filter(F.col(cols[0]).isNotNull())
        )
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def hyperplane_signs(band: int, nbits: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 random-hyperplane components, md5-derived.

    sign(b, i) = +1 iff the first hex char of md5("band:b|i") is >= '8'
    (an unbiased coin from the hash's top bit). Pure-Python constants:
    the planes are literals in the generated plan, and any engine can
    re-derive the identical family — no RNG state to ship.
    """
    out = []
    for b in range(nbits):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{band}:{b}|{i}".encode()).hexdigest()
            row.append(1 if h[0] >= "8" else -1)
        out.append(row)
    return out


def hyperplane_code(vec: Column, signs: list[list[int]]) -> Column:
    """SimHash-style LSH bucket code: bit b = [Σ_i sign(b,i)·v_i >= 0].

    Each projection is an index-ordered zip_with/aggregate sum in double —
    bit-identical across engines for identical float inputs, so the sign
    (and hence the bucket) is engine-portable. Per-row, no shuffle.
    """
    dbl = F.transform(vec, lambda x: x.cast("double"))
    code = F.lit(0)
    for b, row in enumerate(signs):
        plane = F.array(*[F.lit(float(s)) for s in row])
        proj = F.aggregate(
            F.zip_with(dbl, plane, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        code = code + F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return code


def embedding_neardup_pairs(
    df: DataFrame, threshold: float = 0.4, nbits: int = 4, nbands: int = 2,
    dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup via random-hyperplane LSH + verify.

    Codes are per-row expressions; candidate pairs come from a self-join
    on (band, code) — the shuffle key is the bucket, never all pairs.
    Survivors are cosine-verified (≥ threshold). At 100 TB, recall is
    tuned with nbits/nbands, and the verify join touches only bucket
    collisions.
    """
    from etl_process_spark.operators.similarity import cosine

    dbl_norm = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
    )
    banded = None
    for band in range(nbands):
        signs = hyperplane_signs(band, nbits, dim)
        part = dbl_norm.select(
            "vid", "v", F.lit(band).alias("band"),
            hyperplane_code(F.col("v"), signs).alias("code"),
        )
        banded = part if banded is None else banded.unionByName(part)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.code") == F.col("b.code"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("vec_a"), F.col("b.vid").alias("vec_b"),
            F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return (
        cand.withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, threshold: float = 0.2,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    |A ∩ B| via a shingle-level equi self-join over DISTINCT shingles,
    |A ∪ B| = |A| + |B| - |A ∩ B|. With `candidates` (e.g. LSH output) the
    join is restricted to those pairs — the scale path; without, it
    degrades to all pairs sharing ≥1 shingle (fine at test scale, explicit
    opt-in only).
    """
    sh = (
        df.select(F.col(id_col).alias("doc"), F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("sh"))
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    if candidates is not None:
        inter = inter.join(candidates, on=["doc_a", "doc_b"], how="left_semi")
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
