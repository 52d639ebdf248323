"""Property tests: distributed BPE train+apply ≡ a naive Python reference.

`tokenizer_bpe_apply`'s DuckDB oracle replays the SAME framed-replace
formulation, so a shared bug would pass the differential. This reference
implements BPE the textbook way (symbol lists, no string framing) and
must agree exactly — merges, tie-breaks, per-doc symbol counts — on
hypothesis-generated corpora including the nasty cases (repeated chars,
single-char docs, duplicate docs, whitespace runs).
"""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_process_spark.operators.text import bpe_apply, bpe_merge_rounds

words = st.text(alphabet="abcz", min_size=1, max_size=5)
docs_strategy = st.lists(
    st.lists(words, min_size=1, max_size=4).map(" ".join),
    min_size=1,
    max_size=6,
)


def _ref_bpe(texts: list[str], rounds: int):
    """Naive BPE: tokenize on whitespace (lowercased), each token a list
    of symbols; per round count adjacent pairs corpus-wide, merge the
    (count desc, pair asc) winner everywhere (left-to-right, as the
    non-overlapping framed replace does). Returns (merges, per-doc
    symbol counts before, after)."""
    corpus = [
        [list(tok) for tok in t.strip().lower().split()] if t.strip() else [[""]]
        for t in texts
    ]
    before = [sum(len(s) for s in doc) for doc in corpus]
    merges = []
    for _ in range(rounds):
        counts: Counter = Counter()
        for doc in corpus:
            for sym in doc:
                for a, b in zip(sym, sym[1:]):
                    counts[(a, b)] += 1
        if not counts:
            merges.append(None)
            continue
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        for doc in corpus:
            for i, sym in enumerate(doc):
                out, j = [], 0
                while j < len(sym):
                    if j + 1 < len(sym) and (sym[j], sym[j + 1]) == pair:
                        out.append(sym[j] + sym[j + 1])
                        j += 2
                    else:
                        out.append(sym[j])
                        j += 1
                doc[i] = out
    after = [sum(len(s) for s in doc) for doc in corpus]
    return merges, before, after


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy)
def test_bpe_apply_matches_naive_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, before, after = _ref_bpe(list(texts), rounds=2)

    got = {
        r["doc_id"]: (r["char_syms"], r["bpe_syms"])
        for r in bpe_apply(df, "text", "doc_id", rounds=2).collect()
    }
    want = {i: (b, a) for i, (b, a) in enumerate(zip(before, after))}
    assert got == want

    trained = {
        r["merge_round"]: r["pair"]
        for r in bpe_merge_rounds(df, "text", rounds=2).collect()
    }
    for rnd, pair in enumerate(merges, start=1):
        if pair is not None:
            assert trained[rnd] == f"{pair[0]} {pair[1]}"


def test_delta_rounds_equal_recount_rounds(spark):
    """Cross-algorithm agreement on real data: delta pair-count
    maintenance must reproduce the recount trainer's merges and counts
    exactly, round for round."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from etl_process_spark.operators.text import bpe_merge_rounds_delta

    rec = [
        (r["merge_round"], r["pair"], r["n"])
        for r in bpe_merge_rounds(docs, "text", rounds=6).collect()
    ]
    dlt = [
        (r["merge_round"], r["pair"], r["n"])
        for r in bpe_merge_rounds_delta(docs, "text", rounds=6).collect()
    ]
    assert rec == dlt and len(rec) == 6


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy)
def test_delta_rounds_match_naive_reference(spark, texts):
    from etl_process_spark.operators.text import bpe_merge_rounds_delta

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, _, _ = _ref_bpe(list(texts), rounds=3)
    trained = {
        r["merge_round"]: r["pair"]
        for r in bpe_merge_rounds_delta(df, "text", rounds=3).collect()
    }
    for rnd, pair in enumerate(merges, start=1):
        if pair is not None:
            assert trained[rnd] == f"{pair[0]} {pair[1]}"


def test_weighted_vocab_never_grows_duplicate_rows(spark):
    """ADVICE r11 worried that distinct tokens could converge to the
    same symbol string after merges, silently duplicating vocab rows
    and eroding the vocab-sized-per-round advantage. They cannot:
    tokens are whitespace-split (no token contains a space), bpe_wrap
    is injective on the character sequence, and a merge rewrite only
    moves segmentation boundaries (double vs single spaces) — the
    underlying character sequence of each row is invariant. This test
    pins that invariant through adversarially-similar tokens ('a b'
    lookalikes: 'ab', 'aab', single chars) across several rewrites."""
    from etl_process_spark.operators.text import (
        _bpe_rewrite,
        _pair_counts,
        _weighted_vocab,
    )

    docs = spark.createDataFrame(
        [("ab a b aab ab ba b a abab",), ("ab aab ba aa bb a",)],
        "text string",
    )
    wrapped = _weighted_vocab(docs, "text")
    n0 = wrapped.count()
    assert wrapped.select("s").distinct().count() == n0
    total_w = wrapped.agg(F.sum("w")).first()[0]
    for _ in range(4):
        counts = _pair_counts(wrapped)
        winner = counts.orderBy(F.col("n").desc(), F.col("pair").asc()).limit(1)
        wrapped = _bpe_rewrite(wrapped, winner).localCheckpoint()
        # row count, s-distinctness and total occurrence mass all
        # invariant: no duplicates appear, nothing needs re-aggregation
        assert wrapped.count() == n0
        assert wrapped.select("s").distinct().count() == n0
        assert wrapped.agg(F.sum("w")).first()[0] == total_w
        # character sequences (spaces stripped) are untouched by merges
        chars = {
            r[0] for r in wrapped.select(
                F.translate("s", " ", "")
            ).collect()
        }
        assert len(chars) == n0
