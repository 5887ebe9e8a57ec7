"""Connected components — iterative min-label propagation on DataFrames.

The last step of any near-duplicate pipeline: LSH/verification emits
PAIRS, but dedup policy needs CLUSTERS ("keep one doc per duplicate
group"), i.e. connected components of the pair graph.

Algorithm: every node starts labeled with itself; each round, a node
takes the min label among itself and its neighbors; stop when no label
changes. Converges in O(graph diameter) rounds — duplicate clusters are
near-cliques (diameter ≤ ~3), so 3-4 rounds in practice. Each round is
one join + one aggregation, both on the node key.

At 100 TB: this simple propagation is fine for dedup graphs (many tiny
components). For adversarial graphs (long chains, giant components) use
the large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — same join-per-round
shape, provably O(log^2 n) rounds. Lineage is truncated every round via
localCheckpoint so plans don't grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(node, cluster) for every node appearing in ``edges``; cluster ==
    min node id of the component. Raises if not converged in max_iter
    (duplicate-cluster graphs converge in a handful of rounds)."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionAll(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.distinct().persist()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("cluster"))
        .persist()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("cluster").alias("nb_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("cluster"), F.coalesce(F.col("nb_min"), F.col("cluster"))).alias(
                    "cluster"
                ),
            )
            .localCheckpoint()  # truncate lineage each round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            sym.unpersist()
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
