"""Connected components over candidate-pair edges — the clustering step a
near-dedup pipeline runs AFTER pairwise detection: LSH/MinHash emit pairs,
but keep/drop decisions need whole *clusters* (a near-dup chain a–b, b–c
must collapse to ONE canonical doc even though (a, c) was never a
candidate pair).

The reference has no graph surface at all (its entire compute is the
149-line tribute stream, ``script/TributeStreamingJob.py``); this is an
engine extension for the LLM-curation tier, same mandate as the dedup
operators that feed it.

Algorithm: deterministic min-label propagation to a fixpoint — every node
starts labeled with its own id; each round every node takes the min label
across itself and its neighbors; converged when no label changes.  Rounds
needed = graph diameter, and near-dup clusters are small and dense
(diameter ≲ 4 in practice), so the loop is short.  Each round is ONE
shuffle on node id (edges join labels, then a min-aggregate); labels are
(node, label) longs only — no payload ever enters the loop.  The round-N
frame is pinned and the round-N−1 pin released, so lineage and cache stay
bounded.  For adversarial long-chain graphs the alternating large-star /
small-star variant (Kiveris et al., "Connected Components in MapReduce
and Beyond") converges in O(log n) rounds with the same per-round shape —
the propagation loop below is the dial-free special case, and the
round bound guards against pathological inputs either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import pin


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Label every node with the smallest node id reachable from it.

    ``nodes``: one row per node (singletons keep their own id as label).
    ``edges``: undirected pairs (each edge internally mirrored).
    Returns ``(node, component_id)``; deterministic — the fixpoint is
    unique regardless of execution order.

    Raises if the propagation hasn't converged after ``max_rounds`` (the
    fixpoint always exists; the bound only guards runaway inputs whose
    diameter exceeds it, where the large-star/small-star variant is the
    right tool)."""
    und = pin(
        edges.select(
            F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
        ).union(
            edges.select(
                F.col(dst_col).alias("__src"), F.col(src_col).alias("__dst")
            )
        )
    )
    # propagate over edge-TOUCHED nodes only: in a near-dup corpus the
    # pair-touched subset is a small fraction of n, so every round's join/
    # aggregate runs on |touched| ≈ 2·|edges| rows, not the whole corpus;
    # untouched nodes are singletons by definition and union back at the
    # end labeled with themselves (one anti-join, no loop participation)
    touched = und.select(F.col("__src").alias("node")).distinct()
    labels = pin(touched.withColumn("component_id", F.col("node")))
    for _ in range(max_rounds):
        neighbor_labels = und.join(
            labels, und["__src"] == labels["node"]
        ).select(F.col("__dst").alias("node"), "component_id")
        new_labels = pin(
            labels.union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component_id").alias("component_id"))
        )
        improved = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component_id") < F.col("o.component_id"))
        )
        done = improved.isEmpty()
        labels.unpersist()
        labels = new_labels
        if done:
            # the final labels hold exactly the touched set — anti-join
            # against the CACHED frame, not the touched lineage
            singletons = nodes.select(F.col(id_col).alias("node")).join(
                labels.select("node"), "node", "left_anti"
            )
            # pin the full roster: downstream consumers (component_sizes
            # joins labels twice) must not re-execute the anti-join branch
            return pin(
                labels.union(
                    singletons.withColumn("component_id", F.col("node"))
                )
            )
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_rounds} rounds — "
        "diameter exceeds the bound; use more rounds or a star-contraction "
        "variant for chain-shaped graphs"
    )


def component_sizes(labels: DataFrame) -> DataFrame:
    """Attach each node's component size — the fan-out a canonical-keep
    stage needs (``component_size = 1`` ⇒ unique doc).  One extra shuffle
    on component_id."""
    counts = labels.groupBy("component_id").agg(
        F.count("*").alias("component_size")
    )
    return labels.join(counts, "component_id").select(
        "node", "component_id", "component_size"
    )
