"""Distributed connected components — the dedup endgame.

Pairwise near-dup matches (MinHash-LSH, SimHash, phash...) are only
half of deduplication: the decision "which rows to keep" needs the
transitive closure — if A~B and B~C, then {A,B,C} is ONE cluster even
though (A,C) never matched. This operator turns a pair list into a
per-node cluster id (the minimum node id in the component), the
canonical keep-first policy.

Algorithm: iterative min-label propagation over the undirected edge
list — each round every node takes the minimum label among itself and
its neighbors (one join + one map-side-combinable groupBy-min per
round), until a fixpoint. Rounds needed = graph diameter. Near-dup
clusters are dense and tiny in practice (LSH verify makes them
clique-like), so this converges in 2-3 rounds at any corpus size; for
adversarially chained graphs (diameter ~ n) the O(log n)-round
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — public literature) is
the drop-in replacement, same contract.

Scale posture: state per round is one (id, label) table partitioned by
id; the join exchanges only the edge list; no driver-side state, no
collect — the convergence check is a LIMIT 1 anti-join count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(a, b) undirected pair list → (id, cluster_id) for every node
    that appears in at least one pair; cluster_id = min node id in the
    connected component. Deterministic (unique fixpoint)."""
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    edges = fwd.unionByName(rev).distinct().persist()

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    labels.count()  # materialize before the loop re-derives from it

    for _ in range(max_iter):
        msgs = edges.join(
            labels, edges["src"] == labels["id"], "inner"
        ).select(F.col("dst").alias("id"), "label")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        # fixpoint test: any (id, label) not present before?
        changed = (
            new_labels.join(labels, ["id", "label"], "left_anti")
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    edges.unpersist()
    return labels.select("id", F.col("label").alias("cluster_id"))
