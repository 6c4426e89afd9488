"""Connected components over a pair/edge list — the cluster-assignment step
that turns near-dup PAIRS (MinHash-LSH, SimHash, embedding-cosine) into
dedup FAMILIES with one canonical document each.

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round every node takes the min label over itself and its
neighbors; fixpoint = components labeled by their minimum member. Rounds
needed = graph diameter — for near-dup families that is tiny (pairs from
banding form near-cliques, diameter ≤ 2-3 in practice), so the loop
converges in a handful of rounds. Each round is ONE shuffle (join on node
+ min-aggregate with map-side partial agg); the convergence probe is a
``limit(1).count()`` on the label-change set, not a full count.

Scale note: for adversarially long chain graphs (diameter ~ n) production
systems switch to alternating large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond"), which converges in
O(log n) rounds of the same join+min shape. Near-dup clustering never has
that shape — a chain of pairwise-similar-but-transitively-different docs
that long does not survive an est-Jaccard threshold — so the simple
propagation is the right cost here and ``max_iter`` guards the pathology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label each node reachable through ``edges`` with the minimum node id
    of its component. Returns ``DataFrame[node, component]`` covering every
    node that appears in an edge (callers left-join and coalesce to pick up
    singletons). Deterministic; raises if not converged by ``max_iter``."""
    # localCheckpoint (eager) after every round: iterative plans otherwise
    # grow lineage linearly — each round Catalyst re-optimizes the whole
    # history and the job eventually crawls/overflows. The checkpoint
    # truncates the plan to a cached leaf; cluster-durable `checkpoint()`
    # would be the choice where executor loss must be survivable mid-run.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = sym.join(labels, sym.b == labels.node).select(
            F.col("a").alias("node"), F.col("component")
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds the near-dup assumption; use a "
        "large-star/small-star variant for chain-shaped graphs)"
    )
