"""Stream-stream time-bounded join.

The batch engine's interval/as-of joins (operators/asof.py,
operators/intervals.py) have one streaming sibling: the watermarked
stream-stream equi-join with a time-range condition. Spark buffers both
sides in state keyed by the join key; the watermark + time bound tell the
state store exactly when a buffered row can never match again and is
evicted — without the bound, stream-stream state grows forever.

State size is O(rows inside the watermark horizon), independent of stream
length — the property that makes this run indefinitely at production rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bounded_join_stream(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    within: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event happens in
    ``[left_ts, left_ts + within)``.

    Both sides carry a watermark of ``watermark``: left state can be
    dropped once the right watermark passes ``left_ts + within``; right
    state once the left watermark passes ``right_ts``. Column names (apart
    from ``key``) must be disjoint.

    ``how="left_outer"`` additionally emits every unmatched left row
    (right columns NULL) — but only once the watermark has passed
    ``left_ts + within``, the moment Spark can PROVE no match can still
    arrive. Matched rows emit on arrival in both modes; the watermark
    delay is therefore also the outer-result latency, the inherent
    trade-off of streaming outer joins.

    ``how="full_outer"`` emits unmatched rows from BOTH sides. The time
    bound gives each side a provable no-more-matches point — an
    unmatched left row flushes when the watermark passes
    ``left_ts + within``; an unmatched right row when it passes
    ``right_ts`` (its match window is lefts with ``left_ts ∈
    (right_ts - within, right_ts]``). Without bounds on both sides
    Spark rejects the query, because neither side's state could ever
    be declared dead.
    """
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(f"how must be inner, left_outer or full_outer, got {how!r}")
    clash = (set(left.columns) & set(right.columns)) - {key}
    if clash:
        raise ValueError(f"left/right column clash: {sorted(clash)}")
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") < F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    # full_outer: unmatched RIGHT rows have no l.key — surface the key
    # from whichever side is present.
    out_cols = (
        [F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias(key)]
        + [F.col(f"l.{c}").alias(c) for c in left.columns if c != key]
        + [F.col(f"r.{c}").alias(c) for c in right.columns if c != key]
    )
    return l.join(r, cond, how).select(*out_cols)


def time_bounded_join_batch(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Batch twin of ``time_bounded_join_stream`` — identical condition,
    no watermarks. The stream==batch differential test runs both."""
    how = {"left_outer": "left", "full_outer": "full"}.get(how, how)
    l, r = left.alias("l"), right.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") < F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    out_cols = (
        [F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias(key)]
        + [F.col(f"l.{c}").alias(c) for c in left.columns if c != key]
        + [F.col(f"r.{c}").alias(c) for c in right.columns if c != key]
    )
    return l.join(r, cond, how).select(*out_cols)


def enrich_stream(stream: DataFrame, dim: DataFrame, key: str, how: str = "left") -> DataFrame:
    """Stream-static enrichment join — the streaming sibling of the
    reference report's dimension joins (``py_scripts/report.py:42-47``).

    Each micro-batch joins against the CURRENT snapshot of the static
    side: the join is stateless (nothing buffered between batches, no
    watermark required), so it runs forever at O(batch) cost. The static
    side is broadcast — at production scale the dim is the small side by
    construction; if it outgrows broadcast, swap the hint for a bucketed
    layout.

    Because the static side is re-resolved per micro-batch, an external
    process can atomically replace the dim (TableCatalog pointer swap)
    and in-flight streams pick up the new version on the next batch —
    the streaming analog of SCD2 "current version" semantics.
    """
    return stream.join(F.broadcast(dim), key, how)
