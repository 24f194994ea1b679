"""Graph operators for dedup clustering.

Near-duplicate detection yields PAIRS (LSH candidates verified by exact
Jaccard — ``dedup.neardup_pipeline``); deduplication needs CLUSTERS
(keep one doc per connected component of the pair graph). Spark has no
built-in connected components, so :func:`connected_components`
implements iterative min-label propagation as pure DataFrame ops:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated to a fixpoint. Each iteration is one shuffle join + one
aggregation; convergence needs O(component diameter) rounds, and
near-dup components are shallow (dozens of docs, diameter a few hops),
so this is a handful of iterations regardless of corpus size. The
driver-side loop only checks a scalar convergence count per round —
data never leaves the executors; ``localCheckpoint`` truncates the
growing lineage each round so plan size stays constant.

(For adversarial billion-edge graphs with long chains, the
large-star/small-star algorithm [Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC 2014] converges in O(log n) rounds —
the hook here is the same edge-list contract.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 25) -> DataFrame:
    """Label every node of the undirected ``edges`` graph with the MINIMUM
    node id reachable from it (the canonical component representative).

    Returns ``(node, label)``. Deterministic: min is order-insensitive.
    Raises if the fixpoint is not reached within ``max_iter`` rounds
    (returning half-propagated labels would silently split components).
    """
    # Materialize ONCE: sym is re-joined every round, and its lineage embeds
    # whatever produced the edges (e.g. the whole LSH+Jaccard pipeline) —
    # without this the edge computation re-runs per iteration.
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
           .distinct()
           .localCheckpoint(eager=True))
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    for _ in range(max_iter):
        neigh = (sym.join(labels, sym["b"] == labels["node"])
                 .groupBy("a").agg(F.min("label").alias("nlabel")))
        # Carry the old label through the update join so convergence is a
        # filter+count on the checkpointed result — no second join of two
        # full node sets per round just to detect change.
        step = (labels.join(neigh, labels["node"] == neigh["a"], "left")
                      .select(labels["node"],
                              labels["label"].alias("old_label"),
                              F.least(labels["label"],
                                      F.coalesce(F.col("nlabel"),
                                                 labels["label"]))
                               .alias("label"))
                      .localCheckpoint(eager=True))
        changed = step.filter(F.col("label") != F.col("old_label")).count()
        labels = step.select("node", "label")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the bound; raise max_iter")
