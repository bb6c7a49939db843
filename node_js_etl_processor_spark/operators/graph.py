"""Graph analytics on DataFrames — the iterative-algorithm tier next
to dedup's connected components.

The reference has no graph surface (server.js is a linear ETL); this
module belongs to the mandated large-pipeline extension: weighted
PageRank (Page, Brin, Motwani & Winograd 1999) expressed as unrolled
DataFrame iterations, each iteration one keyed join + aggregation —
the standard Pregel-free form. With a FIXED iteration count the whole
computation is SQL-expressible, so unlike most iterative algorithms it
carries a full DuckDB oracle (3 unrolled CTE steps), not a rows-only
check.

Scale shape: the edge aggregation is the only corpus-sized shuffle;
each iteration shuffles the rank vector keyed by node — O(V) rows —
and joins it to the transition table keyed by src. On entity graphs
(nations, domains, publishers) the rank vector broadcasts; on web-
scale node sets both sides partition on the node key and AQE handles
the power-law skew (the same argument as dedup.q_dedup_clusters'
star contraction, which owns the unbounded-iteration variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Standard damping factor.
PR_DAMPING = 0.85


def trade_edges(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """The nation-level trade graph: one edge (src customer nation →
    dst supplier nation) per lineitem, weight = lineitem count.
    Dimension sides broadcast; the fact-side join output collapses to
    ≤ 25×25 weighted edges in one aggregation."""
    return (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").cast("bigint").alias("w"))
    )


def pagerank(
    edges: DataFrame, iterations: int = 3, damping: float = PR_DAMPING
) -> DataFrame:
    """Weighted PageRank, ``iterations`` unrolled DataFrame steps.

    r_{i+1}(v) = (1−d)/N + d·Σ_u r_i(u)·w(u,v)/out(u), nodes = src ∪
    dst, uniform start 1/N. Dangling mass (nodes with no out-edges)
    is dropped each step — the simple form, replayed identically by
    the oracle. Returns (node, pagerank rounded 6, rank by score desc
    / node asc)."""
    from pyspark.sql.window import Window

    out = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    trans = edges.join(out, "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("p")
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # node count: a parameter (entity-graph sized
    # here; at web scale carry it as a 1-row frame instead)
    if n == 0:
        raise ValueError("pagerank: empty edge set (no nodes)")
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
    for _ in range(iterations):
        contrib = (
            trans.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("r") * F.col("p")).alias("inflow"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("r"),
        )
    w = Window.orderBy(F.col("pagerank").desc(), F.col("node").asc())
    return ranks.select(
        "node", F.round(F.col("r"), 6).alias("pagerank")
    ).withColumn("rank", F.row_number().over(w).cast("bigint"))


def q_pagerank(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Declared query (r8): 3-iteration weighted PageRank over the
    nation trade graph. Fully oracle-checked — the DuckDB SQL rebuilds
    the edge weights, the transition probabilities and all three
    iterations as unrolled CTEs in the same float-op order."""
    return pagerank(trade_edges(lineitem, orders, customer, supplier))
