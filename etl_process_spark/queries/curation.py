"""Corpus-curation queries: the ordering/capping/planning operations a
training-data pipeline runs AFTER filtering and dedup — deterministic
global shuffle, per-source caps, epoch planning from the mixture
report, sequence-length histograms, and shared-head (boilerplate
prefix) detection.

Every query follows the repo's output-boundary contract: counts,
ordinals, md5-gate draws and ppm integers only — nothing for an engine
build to disagree on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_process_spark.operators import text as tx
from etl_process_spark.operators.sampling import hash_gate16 as _gate
from etl_process_spark.queries.registry import query, tbl

_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"

# DuckDB twin of operators/sampling.py::hash_gate16: first 16 md5 bits
# of the stringified id — a uniform, engine-portable pseudo-random draw
_GATE_SQL = (
    "CAST(concat('0x', substr(md5(CAST({id} AS VARCHAR)), 1, 4)) AS BIGINT)"
)


@query(
    "global_shuffle_ordinals",
    f"""
    SELECT doc_id,
           row_number() OVER (
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS ord
    FROM documents
    """,
)
def global_shuffle_ordinals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: every document gets a
    contiguous 0-based position in a pseudo-random permutation (order
    by md5(doc_id)) — the reproducible shuffle a trainer needs so that
    run N and a resumed run N see the same sample order.

    The oracle is the textbook single-window row_number; the engine
    computes the identical numbering WITHOUT a one-reducer global sort
    via `operators/ordinals.py::global_ordinals`: the first md5 byte is
    the range bucket (monotone prefix of the sort key), so the only
    unpartitioned window runs over 256 bucket-count rows while each
    bucket numbers its own rows in parallel — the same device as
    `curriculum_ordinals`, here keyed by hash instead of difficulty.
    """
    from etl_process_spark.operators.ordinals import global_ordinals

    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    out = global_ordinals(
        docs,
        order_by=[F.col("h"), F.col("doc_id")],
        # first hex byte of the key: monotone along the (h, doc_id) order
        bucket=F.conv(F.substring("h", 1, 2), 16, 10).cast("int"),
        ordinal_name="ord",
    )
    return out.select("doc_id", (F.col("ord") - 1).cast("bigint").alias("ord"))


@query(
    "source_domain_caps",
    f"""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT source,
           count(*) AS n_docs,
           count(*) FILTER (WHERE rn <= 100) AS n_kept
    FROM ranked GROUP BY source
    """,
)
def source_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (per-domain) document cap — web-corpus curation's
    guard against one crawler-friendly site dominating the mixture:
    keep at most K=100 documents per source, chosen by the md5 draw so
    the kept set is deterministic, order-free, and stable under
    re-crawls (a re-run keeps the same docs, not "the first 100 seen").

    One shuffle on `source`; the per-source window sorts only that
    source's rows. A skew-heavy domain costs its own partition only —
    and at 100 TB the same query runs with `source` salted into the
    range partitioner since only rn ≤ K survives per salt lane (top-K
    union-merge). Emitted as per-source (total, kept) counts — the
    audit table, not the kept rows themselves.
    """
    docs = tbl(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("source", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("rn") <= 100, 1)).alias("n_kept"),
        )
    )


@query(
    "epoch_sampling_plan",
    f"""
    WITH tok AS (
      SELECT doc_id, lang, CAST(len({_TOKS}) AS BIGINT) AS n FROM documents),
    actual AS (SELECT lang, sum(n) AS tokens, count(*) AS docs
               FROM tok GROUP BY lang),
    total AS (SELECT sum(tokens) AS t FROM actual),
    target(lang, ppm) AS (VALUES
      ('en', 500000), ('fr', 200000), ('de', 200000), ('es', 100000)),
    plan AS (
      SELECT a.lang, a.docs,
             CAST((CAST(tg.ppm AS BIGINT) * tt.t) // a.tokens AS BIGINT)
               AS multiplier_ppm
      FROM actual a JOIN target tg ON a.lang = tg.lang CROSS JOIN total tt)
    SELECT p.lang, p.docs,
           CAST(p.multiplier_ppm // 1000000 AS BIGINT) AS full_epochs,
           CAST(p.multiplier_ppm % 1000000 AS BIGINT) AS frac_ppm,
           count(*) FILTER (
             WHERE ({_GATE_SQL.format(id='d.doc_id')} * 1000000) // 65536
                   < p.multiplier_ppm % 1000000) AS n_extra_docs
    FROM plan p JOIN documents d ON d.lang = p.lang
    GROUP BY p.lang, p.docs, p.multiplier_ppm
    """,
)
def epoch_sampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch plan from the mixture multiplier (`mixture_budget_report`):
    a language with multiplier 2.3 is seen 2 full epochs, plus a
    deterministic 30% subset once more. The fractional subset is the
    md5 gate scaled to ppm — exact integer comparison, stable under
    re-runs and appends (the property that makes mid-training dataset
    rebuilds reproducible).

    Two aggregates over (lang, count) partials plus a broadcast of the
    4-row plan back onto the doc table — text never shuffles. All
    arithmetic is BIGINT (multiplier in ppm, gate scaled by 10⁶//2¹⁶).
    """
    docs = tbl(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang",
        F.size(tx.tokens(F.col("text"))).cast("bigint").alias("n"),
    )
    actual = tok.groupBy("lang").agg(
        F.sum("n").alias("tokens"), F.count("*").alias("docs")
    )
    total = actual.agg(F.sum("tokens").alias("t"))
    target = spark.createDataFrame(
        [("en", 500000), ("fr", 200000), ("de", 200000), ("es", 100000)],
        "lang string, target_ppm long",
    )
    plan = (
        actual.join(F.broadcast(target), "lang")
        .crossJoin(F.broadcast(total))
        .select(
            "lang", "docs",
            F.expr("(target_ppm * t) div tokens").alias("multiplier_ppm"),
        )
    )
    gate_ppm = F.expr("(__gate * 1000000) div 65536")
    return (
        docs.select("doc_id", "lang")
        .withColumn("__gate", _gate(F.col("doc_id")))
        .join(F.broadcast(plan), "lang")
        .groupBy("lang", "docs", "multiplier_ppm")
        .agg(
            F.count(
                F.when(gate_ppm < F.col("multiplier_ppm") % 1000000, 1)
            ).alias("n_extra_docs")
        )
        .select(
            "lang", "docs",
            F.expr("multiplier_ppm div 1000000").alias("full_epochs"),
            (F.col("multiplier_ppm") % 1000000).alias("frac_ppm"),
            "n_extra_docs",
        )
    )


@query(
    "seqlen_histogram",
    f"""
    WITH tok AS (SELECT CAST(len({_TOKS}) AS BIGINT) AS n FROM documents),
    b AS (SELECT least(n // 8, 15) AS bucket FROM tok)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(bucket * 8 AS BIGINT) AS lo_tokens,
           count(*) AS n_docs,
           CAST(sum(count(*)) OVER (ORDER BY bucket) AS BIGINT) AS cum_docs
    FROM b GROUP BY bucket
    """,
)
def seqlen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram with cumulative counts — the planning
    input for packing (`packed_training_sequences`) and truncation
    policy: how many documents fit a context budget, and where the
    mass sits. Fixed-width 8-token buckets with a top catch-all
    (exact integer bucketing, no log2/libm at the boundary).

    One map-side bucket assignment + a 16-group aggregate; the
    cumulative window runs over the 16-row histogram, never the
    corpus.
    """
    docs = tbl(spark, sf_dir, "documents")
    b = docs.select(
        F.least(
            F.expr(f"CAST(size({tx_tokens_sql()}) AS BIGINT) div 8"),
            F.lit(15).cast("bigint"),
        ).alias("bucket")
    )
    hist = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return hist.select(
        "bucket",
        (F.col("bucket") * 8).cast("bigint").alias("lo_tokens"),
        "n_docs",
        F.sum("n_docs").over(w).cast("bigint").alias("cum_docs"),
    )


def tx_tokens_sql() -> str:
    """Spark-SQL twin of operators/text.py::tokens (used inside expr)."""
    return "split(trim(lower(text)), '\\\\s+')"


@query(
    "head_dup_docs",
    f"""
    WITH heads AS (
      SELECT doc_id,
             md5(list_aggregate(({_TOKS})[1:16], 'string_agg', ' ')) AS head
      FROM documents),
    texts AS (SELECT d.doc_id, h.head, md5(d.text) AS full_h
              FROM documents d JOIN heads h ON d.doc_id = h.doc_id)
    SELECT head, count(*) AS n_docs,
           count(DISTINCT full_h) AS n_distinct_texts
    FROM texts
    GROUP BY head
    HAVING count(*) > 1
    """,
)
def head_dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-head detection: groups of documents whose first 16 tokens
    are identical — the boilerplate-prefix signature (site templates,
    license headers, crawl artifacts) that exact dedup misses when the
    tails differ. n_distinct_texts < n_docs additionally separates
    true duplicates from template-plus-content pages.

    The shuffle carries 16-byte digests keyed by the head hash, never
    text — same layout as `dedup_exact`; a 100 TB corpus moves
    O(corpus) fingerprint rows once.
    """
    docs = tbl(spark, sf_dir, "documents")
    t = tx.tokens(F.col("text"))
    heads = docs.select(
        F.md5(F.concat_ws(" ", F.slice(t, 1, 16))).alias("head"),
        F.md5(F.col("text")).alias("full_h"),
    )
    return (
        heads.groupBy("head")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("full_h").alias("n_distinct_texts"),
        )
        .where(F.col("n_docs") > 1)
    )
