"""Connected components by min-label propagation — clusters near-duplicate
candidate pairs into dedup groups (the step after MinHash/Jaccard candidate
generation in an LLM dedup pipeline: keep one doc per component).

Iterative: each round every node takes the min label among itself and its
neighbours; converges in O(component diameter) rounds. Pure joins +
groupBy-min — distributed, no driver state. For graphs with huge diameters
switch to alternating large/small-star (the classic MR algorithm); dedup
similarity graphs are dense and shallow, so plain propagation converges in
a handful of rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame, edges: DataFrame, node_col: str = "node", rounds: int = 8
) -> DataFrame:
    """nodes: one column `node_col`; edges: (src, dst) undirected pairs.
    Returns (node, component) where component = min node id reachable
    within `rounds` hops (exact CC when rounds ≥ diameter)."""
    bi = edges.select(F.col("src").alias("n"), F.col("dst").alias("m")).union(
        edges.select(F.col("dst").alias("n"), F.col("src").alias("m"))
    )
    labels = nodes.select(F.col(node_col).alias("n"), F.col(node_col).alias("label"))
    for _ in range(rounds):
        neigh = (
            bi.join(labels, bi.m == labels.n, "inner")
            .select(bi.n.alias("nn"), "label")
            .groupBy("nn")
            .agg(F.min("label").alias("neigh_min"))
        )
        labels = (
            labels.join(neigh, labels.n == neigh.nn, "left")
            .select(
                "n",
                F.least(F.col("label"), F.coalesce("neigh_min", F.col("label"))).alias("label"),
            )
        )
        # truncate lineage every round: `labels` feeds BOTH joins of the
        # next round, so an unmaterialised plan doubles per round — at 6
        # rounds Catalyst planned 2^6 copies of round 1 (64 Exchanges / 94
        # sort-merge joins in the physical plan). A lazy localCheckpoint
        # physical-plans just this round's delta and keeps the tree linear
        # (guide §3.3 / §5: materialise intermediates to truncate very
        # large plans). Values are unchanged — same iteration, same rows.
        labels = labels.localCheckpoint(eager=False)
    return labels.select(F.col("n").alias(node_col), F.col("label").alias("component"))
