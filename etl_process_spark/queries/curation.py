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
             ORDER BY md5(CAST(doc_id AS STRING)), doc_id) - 1 AS ord
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
               ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn
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


from etl_process_spark.operators.sketch import (  # noqa: E402
    LANE_M as _LANE_M,
    LANES as _LANES,
    LINEAR_COUNT_TABLE as _LC,
)

# DuckDB twins of operators/sketch.py::lane_min_sketch's hash columns
_LANE_SQL = (
    "CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 27, 4)) AS BIGINT)"
    f" % {_LANES}"
)
_HASH_SQL = (
    "CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 10)) AS BIGINT)"
)
# hybrid estimator over (sm, nl): shared linear-counting literals,
# exact integer division in the dense branch
_EST_SQL = f"""CAST(CASE
        WHEN {_LANES} - nl >= {_LANES} THEN 0
        WHEN {_LANES} - nl >= 1 THEN ({_LC!r})[{_LANES} - nl]
        ELSE ({_LANES} * {_LANES} * {_LANE_M}
              - ({_LANES} * {_LANES} * {_LANE_M}) % sm) / sm
      END AS BIGINT)"""


@query(
    "user_overlap_sketch",
    f"""
    WITH h AS (
      SELECT event_type, {_LANE_SQL} AS lane, {_HASH_SQL} AS v
      FROM events WHERE event_type IN ('click', 'purchase')),
    sk AS (SELECT event_type, lane, min(v) AS m FROM h GROUP BY 1, 2),
    un AS (SELECT lane, min(m) AS m FROM sk GROUP BY lane),
    agg AS (
      SELECT event_type AS s, sum(m) AS sm, count(*) AS nl FROM sk GROUP BY 1
      UNION ALL
      SELECT '__union', sum(m), count(*) FROM un),
    est AS (SELECT s, {_EST_SQL} AS est FROM agg),
    wide AS (
      SELECT
        (SELECT est FROM est WHERE s = 'click') AS est_click,
        (SELECT est FROM est WHERE s = 'purchase') AS est_purchase,
        (SELECT est FROM est WHERE s = '__union') AS est_union),
    exact AS (
      SELECT count(*) AS exact_overlap FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'))
    SELECT est_click, est_purchase, est_union,
           greatest(est_click + est_purchase - est_union, 0)
             AS est_overlap,
           exact_overlap,
           abs(greatest(est_click + est_purchase - est_union, 0)
               - exact_overlap) * 2 <= exact_overlap + 50 AS estimate_ok
    FROM wide CROSS JOIN exact
    """,
)
def user_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from mergeable lane-min sketches
    (`operators/sketch.py::lane_min_sketch`): distinct click-users ∩
    purchase-users WITHOUT joining or count-distinct-ing the raw sets —
    inclusion–exclusion over three sketch estimates, where the union
    sketch is just the lane-wise min of the two set sketches
    (`lane_union`).

    The 100 TB story: per set the shuffle carries ≤ 64 lane-minimum
    rows per partition (map-side combined min), per-shard sketches
    merge by lane-min, and the overlap of ANY pair of pre-sketched
    audiences is answered from 128 stored rows — no re-scan, no join.
    Because the sketch is md5-deterministic and the hybrid estimator
    (precomputed linear-counting table when lanes are empty, exact
    integer lane-sum formula when saturated) is pure integer
    arithmetic, the ESTIMATE itself is oracle-exact; the `estimate_ok`
    contract (within 50% + small-count slack of the exact intersection,
    computed alongside) is the hashed assertion — same device as
    `approx_distinct_users`.
    """
    from etl_process_spark.operators.sketch import (
        lane_min_estimate,
        lane_min_sketch,
        lane_union,
    )

    ev = tbl(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    sk = lane_min_sketch(ev, F.col("user_id"), F.col("event_type"))
    est = lane_min_estimate(sk.unionByName(lane_union(sk, "__union")))
    wide = est.groupBy().pivot(
        "set", ["click", "purchase", "__union"]
    ).agg(F.first("est"))
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id")
    exact = (
        clicks.intersect(buys)
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    out = wide.crossJoin(F.broadcast(exact)).select(
        F.col("click").alias("est_click"),
        F.col("purchase").alias("est_purchase"),
        F.col("__union").alias("est_union"),
        F.greatest(
            F.col("click") + F.col("purchase") - F.col("__union"), F.lit(0)
        ).cast("long").alias("est_overlap"),
        "exact_overlap",
    )
    return out.withColumn(
        "estimate_ok",
        F.abs(F.col("est_overlap") - F.col("exact_overlap")) * 2
        <= F.col("exact_overlap") + 50,
    )


@query(
    "fs_part_linkage",
    """
    WITH b AS (
      SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice,
             p_size // 8 AS blk
      FROM part)
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(CASE WHEN a.p_type = b.p_type THEN 220 ELSE -80 END
              + CASE WHEN a.p_size = b.p_size THEN 300 ELSE -30 END
              + CASE WHEN levenshtein(a.p_name, b.p_name) <= 2
                     THEN 250 ELSE -60 END
              + CASE WHEN abs(a.p_retailprice - b.p_retailprice) <= 1.0
                     THEN 150 ELSE -40 END AS BIGINT) AS score_cb,
           CASE WHEN CASE WHEN a.p_type = b.p_type THEN 220 ELSE -80 END
                   + CASE WHEN a.p_size = b.p_size THEN 300 ELSE -30 END
                   + CASE WHEN levenshtein(a.p_name, b.p_name) <= 2
                          THEN 250 ELSE -60 END
                   + CASE WHEN abs(a.p_retailprice - b.p_retailprice) <= 1.0
                          THEN 150 ELSE -40 END >= 500 THEN 'match'
                WHEN CASE WHEN a.p_type = b.p_type THEN 220 ELSE -80 END
                   + CASE WHEN a.p_size = b.p_size THEN 300 ELSE -30 END
                   + CASE WHEN levenshtein(a.p_name, b.p_name) <= 2
                          THEN 250 ELSE -60 END
                   + CASE WHEN abs(a.p_retailprice - b.p_retailprice) <= 1.0
                          THEN 150 ELSE -40 END >= 150 THEN 'possible'
                ELSE 'nonmatch' END AS decision
    FROM b a JOIN b b ON a.p_brand = b.p_brand AND a.blk = b.blk
         AND a.p_partkey < b.p_partkey
    WHERE CASE WHEN a.p_type = b.p_type THEN 220 ELSE -80 END
        + CASE WHEN a.p_size = b.p_size THEN 300 ELSE -30 END
        + CASE WHEN levenshtein(a.p_name, b.p_name) <= 2
               THEN 250 ELSE -60 END
        + CASE WHEN abs(a.p_retailprice - b.p_retailprice) <= 1.0
               THEN 150 ELSE -40 END >= 150
    """,
)
def fs_part_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage over the part
    catalog (`operators/linkage.py`): candidate pairs from a
    (brand, size-band) block, each scored by summing per-field
    agreement/disagreement weights in exact integer centibans —
    type (+220/−80), exact size (+300/−30), name edit distance ≤ 2
    (+250/−60), price within 1.0 (+150/−40) — then thresholded into
    match (≥ 500) / possible (≥ 150). Below-possible pairs are dropped
    so the output is plausible-link-sized, not block-quadratic.

    This is the decision layer deterministic ER
    (`part_entity_clusters`) lacks: a graded score with an explicit
    clerical-review band, the Fellegi–Sunter shape every production
    linker (Splink, dedupe.io) implements — weights here are config
    constants exactly like `quality_logit_score`'s logistic weights,
    so EM-estimated m/u probabilities drop in without touching the
    plumbing.

    Scale: blocking keys shuffle the catalog once; scoring is
    whole-stage-codegen per pair row; the only float op is a
    pass-through price comparison of identical source doubles. The
    weights being integers makes every score — and the hash — exact.
    """
    from etl_process_spark.operators.linkage import FieldWeight, fs_score

    pt = tbl(spark, sf_dir, "part").withColumn(
        "blk", F.expr("p_size div 8")
    )
    a = pt.select(*[F.col(c).alias(f"a_{c}") for c in pt.columns])
    b = pt.select(*[F.col(c).alias(f"b_{c}") for c in pt.columns])
    pairs = a.join(
        b,
        (F.col("a_p_brand") == F.col("b_p_brand"))
        & (F.col("a_blk") == F.col("b_blk"))
        & (F.col("a_p_partkey") < F.col("b_p_partkey")),
    )
    # cheap comparators first; the expensive edit distance only runs
    # when the cheap partial score can still reach the 'possible'
    # threshold (all-cheap-disagree pairs top out at -150 + 250 = 100 <
    # 150, so their lev call is provably wasted — CASE WHEN evaluates
    # lazily in codegen, cutting most levenshtein work in dense blocks;
    # emitted rows always clear the guard, so scores match the oracle,
    # which states the unpruned formula)
    cheap = (
        F.when(F.col("a_p_type") == F.col("b_p_type"), 220).otherwise(-80)
        + F.when(F.col("a_p_size") == F.col("b_p_size"), 300).otherwise(-30)
        + F.when(
            F.abs(F.col("a_p_retailprice") - F.col("b_p_retailprice")) <= 1.0,
            150,
        ).otherwise(-40)
    )
    fields = [
        FieldWeight("type", F.col("a_p_type") == F.col("b_p_type"), 220, -80),
        FieldWeight("size", F.col("a_p_size") == F.col("b_p_size"), 300, -30),
        FieldWeight(
            "name",
            (cheap >= -100) & (F.levenshtein("a_p_name", "b_p_name") <= 2),
            250, -60,
        ),
        FieldWeight(
            "price",
            F.abs(F.col("a_p_retailprice") - F.col("b_p_retailprice")) <= 1.0,
            150, -40,
        ),
    ]
    scored = fs_score(pairs, fields, match_at=500, possible_at=150)
    return scored.where(F.col("score_cb") >= 150).select(
        F.col("a_p_partkey").alias("key_a"),
        F.col("b_p_partkey").alias("key_b"),
        "score_cb",
        "decision",
    )


@query(
    "source_overlap_matrix",
    f"""
    WITH fp AS (
      SELECT DISTINCT source,
             md5(list_aggregate(({_TOKS})[1:16], 'string_agg', ' ')) AS f
      FROM documents),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source)
    SELECT source_a, source_b, count(*) AS n_shared_heads
    FROM pairs GROUP BY 1, 2
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication audit: for every source pair, how many
    distinct document HEADS (first 16 tokens, `head_dup_docs`'s
    fingerprint — mirrors usually diverge in tails, not heads) they
    share — the provenance matrix that tells a corpus curator which
    feeds mirror each other, and therefore which dedup keep-priority
    ordering matters.

    Shuffle carries (source, 16-byte digest) pairs once; the join is a
    digest-keyed equi join whose per-key fan-out is the number of
    sources carrying that head (≤ sources, never corpus-sized) — the
    same digest-only layout as `dedup_exact`.
    """
    docs = tbl(spark, sf_dir, "documents")
    t = tx.tokens(F.col("text"))
    fp = docs.select(
        "source", F.md5(F.concat_ws(" ", F.slice(t, 1, 16))).alias("f")
    ).distinct()
    a = fp.select(F.col("source").alias("source_a"), "f")
    b = fp.select(F.col("source").alias("source_b"), "f")
    return (
        a.join(b, "f")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_heads"))
    )


@query(
    "source_quality_report",
    f"""
    WITH qz AS (
      SELECT doc_id,
             -200000000 + 1000000 * n_tokens + 30 * avg_u
                        + 300 * stop_u + 150 * lex_u AS z_units
      FROM (
        SELECT doc_id,
               len(toks) AS n_tokens,
               CAST((1000000 * list_sum([length(t) for t in toks]))
                    // len(toks) AS BIGINT) AS avg_u,
               CAST((1000000 * len(list_filter(toks,
                       t -> t IN ('the','a','of','and','is'))))
                    // len(toks) AS BIGINT) AS stop_u,
               CAST((1000000 * len(list_distinct(toks)))
                    // len(toks) AS BIGINT) AS lex_u
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)))
    SELECT d.source,
           count(*) AS n_docs,
           CAST((sum(q.z_units) - sum(q.z_units) % count(*)) / count(*)
                AS BIGINT) AS mean_logit_units,
           CAST((1000000 * count(*) FILTER (WHERE q.z_units >= 0)
                 - (1000000 * count(*) FILTER (WHERE q.z_units >= 0))
                   % count(*)) / count(*) AS BIGINT) AS keep_ppm
    FROM documents d JOIN qz q ON d.doc_id = q.doc_id
    GROUP BY d.source
    """,
)
def source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality accounting by provenance: per source the mean
    quality-logit (exact integer units, `quality_logit_score`'s scorer)
    and the fraction of docs the keep-threshold retains, in ppm — the
    table that decides per-source mixture weights and flags a feed
    whose quality regressed.

    One map stage computes every doc's integer logit (zero shuffles),
    then a source-keyed aggregate of (sum, count) partials. The mean is
    a truncating integer division of exact BIGINTs; note sum(z_units)
    can be negative, and both engines truncate toward zero identically.
    """
    docs = tbl(spark, sf_dir, "documents")
    q = _quality_z(docs)
    joined = docs.select("doc_id", "source").join(q, "doc_id")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("sum(z_units) div count(*)").alias("mean_logit_units"),
        F.expr(
            "(1000000 * count(if(z_units >= 0, 1, NULL))) div count(*)"
        ).alias("keep_ppm"),
    )


def _quality_z(docs: DataFrame) -> DataFrame:
    from etl_process_spark.queries.llmdata import _quality_z_units

    return _quality_z_units(docs)
