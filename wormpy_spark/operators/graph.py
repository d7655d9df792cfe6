"""Link-graph PageRank over the document corpus (fixed iterations,
exact integer arithmetic).

The reference crawler materializes the link graph implicitly — every
page row carries its outlinks (reference ``modules/processors/
content_processor.py:105-131`` builds ``discovered_urls`` per page;
``main.py`` walks them breadth-first) — but never ranks it. Ranking
the crawl graph is the canonical next analytics step at web scale, so
the engine ships it as a first-class operator.

Graph construction is deterministic from the ``documents`` table alone
(sandbox rule: no external data): node ids are the contiguous
``doc_id`` range, and each node emits exactly ``FANOUT`` pseudo-links

    dst_j = (doc_id^2 + C_j) mod n            (C_j: public hash primes)

The quadratic map collides (s and n-s land together), so in-degree —
and therefore rank — is non-uniform; self-loops and duplicate edges
are kept, so every node still has out-degree exactly ``FANOUT`` and
there is no dangling-mass special case. Both engines (Spark and the DuckDB oracle) rebuild
the identical edge set with pure BIGINT arithmetic.

Exact cross-engine parity: damping 0.85 = 17/20 and uniform fan-out 3
make every rank after ``t`` iterations a rational with denominator
n * 60^t:

    num_0(v)     = 1                      (rank_0 = 1/n)
    num_{t+1}(v) = 9 * 60^t  +  17 * sum_{u -> v} num_t(u)

so the whole computation runs in BIGINT (order-independent integer
sums — float summation order would differ between engines and break
the driver's value hash). Magnitudes stay far below 2^53: num_t <=
n * 60^t, i.e. ~1.3e10 at n = 600k docs and t = 3. The final rank
double is a single division by the common denominator — bit-identical
across engines given identical integers.

100-TB posture: each iteration is one shuffle pair (edges join ranks
on src, partial-aggregated by dst) plus a broadcast-free left join
back to the node table on the same key; Catalyst reuses the doc_id
hash partitioning across iterations, AQE handles in-degree skew, and
the iteration count is a small constant so lineage stays shallow (no
checkpoint needed; cf. operators/components.py for the unbounded-
iteration pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FANOUT = 3
DAMP_NUM, DAMP_DEN = 17, 20  # 0.85
# public 32-bit hash primes (Knuth multiplicative / xxhash primes)
EDGE_CONSTS = (2654435761, 2246822519, 3266489917)


def _edges(docs: DataFrame, n: int) -> DataFrame:
    """(src, dst) with multiplicity; out-degree exactly FANOUT."""
    parts = [
        docs.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * F.col("doc_id") + F.lit(c)) % F.lit(n)).alias("dst"),
        )
        for c in EDGE_CONSTS
    ]
    e = parts[0]
    for p in parts[1:]:
        e = e.unionAll(p)
    return e


def pagerank_fixed(
    spark: SparkSession, docs: DataFrame, iterations: int = 3
) -> DataFrame:
    """PageRank over the deterministic pseudo-link graph.

    Returns (doc_id, pr_num, pr): ``pr_num`` the exact integer
    numerator (the certified column), ``pr`` the rank double
    ``pr_num / (n * 60^iterations)``.
    """
    n = docs.count()  # one scalar action; the node table is reused below
    nodes = docs.select("doc_id")
    edges = _edges(nodes, n)

    # num_0 = 1 for every node
    ranks = nodes.withColumn("num", F.lit(1).cast("long"))
    scale = 1  # 60^t
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges.src == ranks.doc_id)
            .groupBy("dst")
            .agg(F.sum("num").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, nodes.doc_id == contrib.dst, "left")
            .select(
                "doc_id",
                (
                    F.lit(9 * scale)
                    + F.lit(DAMP_NUM) * F.coalesce(F.col("in_sum"), F.lit(0))
                ).cast("long").alias("num"),
            )
        )
        scale *= 60
    denom = float(n * scale)
    return ranks.select(
        "doc_id",
        F.col("num").alias("pr_num"),
        (F.col("num") / F.lit(denom)).alias("pr"),
    )


def pagerank_duck_sql(iterations: int = 3) -> str:
    """The unrolled DuckDB oracle for ``pagerank_fixed`` — identical
    BIGINT recurrence, one CTE per iteration."""
    edge_union = "\n    UNION ALL\n".join(
        f"    SELECT doc_id AS src, (doc_id * doc_id + {c}) % nn.n AS dst"
        f" FROM documents, nn"
        for c in EDGE_CONSTS
    )
    sql = [
        "WITH nn AS (SELECT count(*) AS n FROM documents),",
        "e AS (",
        edge_union,
        "),",
        "r0 AS (SELECT doc_id, 1::BIGINT AS num FROM documents),",
    ]
    scale = 1
    for t in range(iterations):
        prev, cur = f"r{t}", f"r{t + 1}"
        sql.append(
            f"{cur} AS (SELECT d.doc_id,"
            f" ({9 * scale}::BIGINT + 17 * coalesce(s.in_sum, 0))::BIGINT AS num"
            f" FROM documents d LEFT JOIN"
            f" (SELECT e.dst, sum(r.num)::BIGINT AS in_sum"
            f" FROM e JOIN {prev} r ON e.src = r.doc_id GROUP BY e.dst) s"
            f" ON d.doc_id = s.dst)"
            + ("," if t < iterations - 1 else "")
        )
        scale *= 60
    sql.append(
        f"SELECT doc_id, num AS pr_num,"
        f" num / (nn.n * {scale}.0) AS pr"
        f" FROM r{iterations}, nn"
    )
    return "\n".join(sql)


def degree_stats(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """In-degree distribution of the pseudo-link graph: (in_degree,
    n_nodes), zero-in-degree nodes included via the left join back to
    the node table. Out-degree is FANOUT by construction, so in-degree
    is the only informative marginal — the quadratic map makes it
    lumpy (collisions), which is exactly what a crawl-graph health
    check looks for (dangling mass, super-collectors).

    100-TB posture: one shuffle to count per dst (map-side combined),
    one join on the node key, one tiny re-aggregation — no windows,
    no driver state; AQE splits any super-collector's reduce task.
    """
    n = docs.count()
    nodes = docs.select("doc_id")
    edges = _edges(nodes, n)
    indeg = edges.groupBy("dst").agg(F.count("*").alias("d"))
    return (
        nodes.join(indeg, nodes.doc_id == indeg.dst, "left")
        .select(F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("in_degree"))
        .groupBy("in_degree")
        .agg(F.count("*").cast("long").alias("n_nodes"))
    )


def degree_stats_duck_sql() -> str:
    """DuckDB oracle for ``degree_stats`` — identical edge CTE."""
    edge_union = "\n    UNION ALL\n".join(
        f"    SELECT doc_id AS src, (doc_id * doc_id + {c}) % nn.n AS dst"
        f" FROM documents, nn"
        for c in EDGE_CONSTS
    )
    return (
        "WITH nn AS (SELECT count(*) AS n FROM documents),\n"
        "e AS (\n" + edge_union + "\n),\n"
        "ind AS (SELECT dst, count(*)::BIGINT AS d FROM e GROUP BY dst)\n"
        "SELECT coalesce(ind.d, 0)::BIGINT AS in_degree,\n"
        "       count(*)::BIGINT AS n_nodes\n"
        "FROM documents LEFT JOIN ind ON documents.doc_id = ind.dst\n"
        "GROUP BY 1"
    )
