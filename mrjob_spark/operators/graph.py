"""Distributed connected components (duplicate clustering).

Near-dup detection (operators/dedup.py) yields PAIRS; production dedup
needs CLUSTERS — every document labeled with one representative per
connected component of the pair graph, so the pipeline can keep one copy
per cluster. The reference has no graph operators at all; its closest
pattern is iterated MRJob steps (``mrjob/job.py:497-545``), which is
exactly what this is, Spark-style.

Algorithm: iterative min-label propagation. Each round every node adopts
``min(own label, min of neighbors' labels)``; at fixpoint every node of a
component carries the component's minimum id. Rounds needed = graph
diameter — near-dup clusters are shallow (stars/cliques), so convergence
is fast. Each round is one join + one aggregation, both shuffling on node
id; ``localCheckpoint`` truncates lineage every round (unbounded lineage
is the classic iterative-Spark failure mode). For web-scale graphs with
long chains, swap in the large-star/small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond") — same interface.

The result is deterministic (min reachable id), which is what lets the
registry query ``l1_dedup_clusters`` be oracle-checked by a DuckDB
``WITH RECURSIVE`` transitive closure over the same edge SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node that appears in ``edges``, where
    ``component`` is the minimum node id reachable through the undirected
    edge set. Raises if the graph hasn't converged after ``max_iter``
    rounds (diameter > max_iter — use the star-contraction variant)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["u"] == labels["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph diameter too large — use star-contraction"
    )
