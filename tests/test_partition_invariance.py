"""Results must not depend on the partition count.

On a 1000-executor cluster every shuffle lands on a different partition
count than local[4]; any query whose output changes with
``spark.sql.shuffle.partitions`` is silently wrong at scale — float
partial-sum ordering, collect_list order leaks, and unpinned window
ties are the classic causes. The corpus's contracts (DECIMAL partials,
sort_array before concat, total tie orders) claim immunity; this test
samples the most order-sensitive families and checks the claim by
executing each query under 3 and then 17 shuffle partitions and
comparing canonicalized results exactly.

(`tests/test_oracle.py` checks Spark≡DuckDB at ONE partitioning; this
checks Spark≡Spark across partitionings — a different failure mode.)
"""

from __future__ import annotations

import pytest

from etl_process_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# One representative per order-sensitivity family.
SAMPLE = [
    "pricing_summary",            # float agg over many rows
    "daily_quality_drift",        # DECIMAL-sum mean + lag over agg
    "fraud_rules_union",          # UNION ALL bag + window lags
    "chunk_dedup_rewrite",        # collect_list + sort_array reassembly
    "curriculum_ordinals",        # bucket offsets + per-bucket row_number
    "minhash_signatures",         # min-agg partials
    "embedding_covariance",       # DECIMAL pair sums → rounded doubles
    "exact_median_by_type",       # histogram prefix sums + in-bucket rank
    "neardup_clusters",           # iterative min-label propagation
    "packed_training_sequences_sharded",  # windowed cumsum lanes
    "event_transition_probs",     # lead ties + tiny-table normalize
    "cms_user_event_counts",      # sketch cell aggregation
    "margin_bitext_pairs",        # Arrow cell blocks: row order into numpy
    "simhash_dup_pairs",          # codegen bit tallies + bucket explosion
    "tokenizer_bpe_apply",        # winner broadcast + per-doc rewrites
    "spearman_chars_tokens",      # bucket-prefix-sum global ordinals
    "neardup_method_agreement",   # LSH bucket join vs prefix-filter truth
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("name", SAMPLE)
def test_result_is_partition_count_invariant(spark, name):
    spec = QUERIES[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _canon(spec.builder(spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _canon(spec.builder(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
