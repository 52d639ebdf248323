"""Streaming near-duplicate detection: maintain the LSH band index as
documents stream in, emitting candidate pairs per micro-batch.

The batch operators already split the problem the right way
(operators/dedup.py): ``lsh_band_index`` is the STORED state,
``lsh_probe_pairs`` is the per-batch increment that never re-reads the
corpus. Streaming composition is then mechanical — ``foreachBatch``
probes the current index, appends the batch's bands to it through an
atomic catalog pointer swap, and appends the discovered pairs to the
sink. Because bucket collision is pairwise (no transitivity), batch-at-
a-time probing surfaces EXACTLY the pairs a full-corpus recompute would
(the same theorem tests/test_dedup_incremental.py proves for the batch
path) — so a 100 TB corpus ingesting continuously gets its near-dup
pairs at O(batch) cost per trigger, with index state O(corpus bands)
living in the table catalog, not the state store.

Exactly-once under replay (a crash between the sink write and the
checkpoint commit makes Spark re-run the epoch with the same data):

* pairs: ``lsh_probe_pairs`` output is a distinct set, and the sink
  append anti-joins against the stored pairs — a replayed epoch
  re-derives pairs that are already recorded and appends nothing.
* index: new bands are anti-joined against already-indexed doc ids
  before the union, so a replayed (or re-delivered) document cannot
  duplicate its band rows. First write wins — consistent with the
  pairs table's set semantics, and exact because a doc's bands are
  committed atomically (one catalog pointer swap covers all of them).

tests/test_streaming.py::test_neardup_stream_replayed_epoch_is_idempotent
forces the replay by deleting the checkpoint's last commit marker and
restarting — the post-replay index and pairs must be byte-identical
(and the same test run with this guard removed fails: the replayed
epoch doubles its chunk's band rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_process_spark.operators.dedup import lsh_bands, lsh_probe_pairs
from etl_process_spark.sources.tables import TableCatalog

INDEX_TABLE = "lsh_band_index"
PAIRS_TABLE = "neardup_pairs"


def neardup_sink(catalog: TableCatalog, text_col: str, id_col: str):
    """Build the ``foreachBatch`` function: probe, then extend state."""

    def apply(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        new_bands = lsh_bands(batch, text_col, id_col)
        if catalog.exists(INDEX_TABLE):
            index = catalog.read(INDEX_TABLE)
            pairs = lsh_probe_pairs(index, batch, text_col, id_col)
            # replay/idempotence guard: a re-run epoch's docs are already
            # indexed; re-unioning their bands would duplicate index rows
            # and double every future bucket probe. Anti-join on doc id
            # (a doc's bands land atomically, so presence of the id means
            # ALL its bands are present).
            fresh = new_bands.join(
                index.select("doc").distinct(), "doc", "left_anti"
            )
            merged_index = index.unionByName(fresh)
        else:
            from etl_process_spark.operators.dedup import bucket_pairs

            pairs = bucket_pairs(new_bands)
            merged_index = new_bands
        if catalog.exists(PAIRS_TABLE):
            # replay-safe: an epoch rerun re-derives the same pairs;
            # anti-join keeps the pairs table a SET
            pairs = pairs.join(
                catalog.read(PAIRS_TABLE), ["doc_a", "doc_b"], "left_anti"
            )
            merged_pairs = catalog.read(PAIRS_TABLE).unionByName(pairs)
        else:
            merged_pairs = pairs
        catalog.overwrite(INDEX_TABLE, merged_index)
        catalog.overwrite(PAIRS_TABLE, merged_pairs.select("doc_a", "doc_b"))

    return apply


def run_neardup_stream(
    stream: DataFrame,
    catalog: TableCatalog,
    text_col: str,
    id_col: str,
    checkpoint: str,
):
    """Attach the near-dup sink to a document stream and process all
    available data (one probe + index extension per micro-batch)."""
    return (
        stream.writeStream.foreachBatch(neardup_sink(catalog, text_col, id_col))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
