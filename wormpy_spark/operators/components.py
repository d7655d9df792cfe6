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


def _union_find_labels(edge_rows: list[tuple]) -> list[tuple]:
    """Driver-side union-find → (id, min id in component) rows."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root keeps the label the component minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = set()
    for a, b in edge_rows:
        nodes.add(a)
        nodes.add(b)
    return [(x, find(x)) for x in sorted(nodes)]


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    driver_max_edges: int = 2_000_000,
    reliable_checkpoints: bool = False,
) -> DataFrame:
    """(a, b) undirected pair list → (id, cluster_id) for every node
    that appears in at least one pair; cluster_id = min node id in the
    connected component. Deterministic (unique fixpoint).

    Two execution paths, same contract (parity-tested):
    - ``driver fast path``: verified near-dup pairs are RARE relative
      to the corpus (that is the point of deduplication), so the edge
      list usually fits in the driver's hand even at 100-TB corpus
      scale; below ``driver_max_edges`` distinct pairs the closure is
      one bounded collect + union-find (the same tiny-rounds pattern as
      plans/fastround.py). The collect is bounded and counted BEFORE
      collecting — never a blind materialization.
    - ``distributed path``: iterative min-label propagation, one
      join + map-side-combinable groupBy-min + one aggregation action
      per round, O(diameter) rounds. ``driver_max_edges=0`` forces it
      (tests; adversarially huge pair lists).

    ``reliable_checkpoints``: per-round lineage truncation uses
    ``localCheckpoint`` by default — right for local mode and healthy
    clusters, but its RDD blocks die with an executor and unpersist()
    frees only cache-manager entries (old blocks linger until JVM GC
    drops the RDD references — acceptable for bounded-round runs). Set
    True on a long fault-tolerant cluster run to use reliable
    ``checkpoint()`` instead; requires
    ``spark.sparkContext.setCheckpointDir(...)`` to a distributed
    path first."""
    spark = pairs.sparkSession
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    edges = fwd.unionByName(rev).distinct().persist()

    n_edges = edges.count()
    if n_edges <= driver_max_edges:
        rows = [(r["src"], r["dst"]) for r in edges.collect()]
        edges.unpersist()
        out = _union_find_labels(rows)
        schema = "id long, cluster_id long"
        if out and not isinstance(out[0][0], int):
            schema = "id string, cluster_id string"
        return spark.createDataFrame(out, schema)

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    n_nodes = labels.count()  # materialize before the loop re-derives

    # size the iteration shuffles to the GRAPH, not the session default:
    # the label table is usually tiny next to the corpus (only paired
    # docs appear), and a 32-partition shuffle per round on a 500-row
    # graph is pure task-scheduling overhead. ~100k labels per
    # partition; grows back to the session width for billion-edge runs.
    default_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_part = max(1, min(default_p, n_nodes // 100_000 + 1))
    edges2 = edges.repartition(n_part, "src").persist()
    edges2.count()
    edges.unpersist()

    # convergence via monotonicity: min-propagation never increases a
    # label, so the label-sum strictly decreases until the fixpoint and
    # is unchanged exactly there — ONE aggregation job per round (which
    # also materializes the new labels), no separate anti-join probe.
    # decimal(38,0) keeps the sum exact at any scale (1e10 ids → 1e20).
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        msgs = edges2.join(
            labels, edges2["src"] == labels["id"], "inner"
        ).select(F.col("dst").alias("id"), "label")
        # localCheckpoint, not persist: persist caches data but keeps
        # the full lineage, so round k's logical plan nests all k-1
        # predecessors — by ~30 rounds just RENDERING the AQE plan
        # string OOMs the JVM (reproduced). Checkpointing truncates the
        # lineage each round, keeping the plan O(1) deep. (A
        # fault-tolerant cluster run would use reliable checkpoint();
        # local is right for this sandbox and any healthy cluster.)
        merged = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .repartition(n_part, "id")
        )
        new_labels = (
            merged.checkpoint(eager=False)
            if reliable_checkpoints
            else merged.localCheckpoint(eager=False)
        )
        row = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]
        labels.unpersist()
        labels = new_labels
        if prev_sum is not None and row["s"] == prev_sum:
            converged = True
            break
        prev_sum = row["s"]

    edges2.unpersist()
    if not converged:
        # Min-label propagation moves a label one hop per round, so a
        # component with diameter > max_iter would exit here with WRONG
        # labels. Wrong cluster ids silently corrupt dedup keep/drop
        # decisions downstream — refuse instead. (Chained near-dups
        # deep enough to hit this want the O(log n)-round
        # large-star/small-star variant cited in the module docstring,
        # or simply a larger max_iter.)
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds: "
            f"a component has diameter > {max_iter}. Raise max_iter (rounds "
            "needed = graph diameter + 1) or use a log-round variant."
        )
    return labels.select("id", F.col("label").alias("cluster_id"))
