"""Connected components — the clustering step of a dedup pipeline.

LSH / near-dup joins (operators/dedup.py) emit PAIRS; a pipeline keeps one
document per duplicate CLUSTER, and clusters are the connected components
of the pair graph. This is the engine's one genuinely iterative operator
(SURVEY §2.9's "iterative algorithms" class): a driver-side loop over
distributed min-label propagation.

Algorithm: every node starts labeled with itself; each round a node takes
the min of its own label and its neighbors' labels; converged when no
label changes. Rounds needed = graph diameter — near-dup clusters are
small and dense (diameter ≤ 3-4 in practice), so the loop is short. Each
round is one shuffle (join on node) + one aggregation; ``localCheckpoint``
truncates the lineage so round N's plan doesn't re-analyze rounds 1..N-1.

For galaxy-scale graphs (web-crawl link graphs, not dedup clusters) the
large-star/small-star algorithm halves round counts via pointer jumping —
out of scope here; the API would not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Label every node of the undirected pair graph with its component id
    (the smallest node id in the component).

    ``edges`` may be directed/one-sided (e.g. ``doc_a < doc_b`` pairs);
    it is symmetrized internally. Returns (node, component) for every node
    that appears in at least one edge — callers union isolated nodes back
    as their own singletons if needed.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.distinct().localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp")))
                .alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("node"), F.col("comp").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds "
        "(graph diameter exceeds the bound — raise max_iterations)"
    )
