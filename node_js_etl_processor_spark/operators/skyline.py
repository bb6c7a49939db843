"""2-D skyline (Pareto frontier) — the classic "maximal vector" OLAP
operator (Börzsönyi, Kossmann & Stocker, ICDE 2001, "The Skyline
Operator"): the parts no other part beats on BOTH price (lower is
better) and size (higher is better).

Parity note: the reference (reference server.js:1-302) has no
preference-query surface; this extends the relational family
(SURVEY.md §2b) with the dominance tier.

Dominance (over DISTINCT (price, size) pairs, so "strict somewhere"
is automatic): q dominates p iff q.price ≤ p.price AND q.size ≥
p.size. The skyline is the set of undominated pairs. The naive form
is a quadratic theta self-join; the 2-D case collapses to a SORT +
RUNNING-MAX instead: order pairs by (price ASC, size DESC) — every
earlier pair has price ≤ and, at equal price, size > — so a pair is
on the skyline iff its size strictly exceeds the running max size of
all earlier pairs. O(n log n), no self-join, no candidate blow-up.

Scale shape (the divide-and-conquer of the ICDE-2001 paper, phrased
as DataFrame ops): a single global-order window is a one-task plan,
so it must only ever see a PRUNED frame. Three stages, each a keyed
shuffle or smaller: (1) the corpus collapses to distinct
(price, size) pairs — one keyed aggregation; (2) the LOCAL phase
keeps, per size value, only the min-price pair (any same-size pair
at a higher price is dominated outright), bounding the survivor set
by the size domain (≤ 50 for part.p_size) regardless of corpus
scale; (3) the GLOBAL running-max window orders only those
survivors. For a continuous second dimension, stage 2 generalizes to
the same prune inside range buckets of the size axis — local
undominated sets within ANY partition of the pairs are a superset of
the global skyline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_pairs(part: DataFrame) -> DataFrame:
    """Collapse part to distinct (price_cents, p_size) pairs with
    count + min-partkey evidence. Money rides as exact cents
    (round(p·100) — the q_scalar_subquery half-even lesson), so both
    engines compare pure integers."""
    return (
        part.select(
            F.round(F.col("p_retailprice") * 100, 0).cast("long").alias(
                "price_cents"
            ),
            F.col("p_size").cast("long").alias("p_size"),
            "p_partkey",
        )
        .groupBy("price_cents", "p_size")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.min("p_partkey").cast("long").alias("min_partkey"),
        )
    )


def q_skyline(part: DataFrame) -> DataFrame:
    """Declared query: the (price ASC, size DESC) skyline of part —
    distinct (price_cents, p_size) pairs no other pair dominates.

    The DuckDB oracle is the BRUTE-FORCE dominance anti-join
    (NOT EXISTS a dominating pair) — it cross-checks the prune +
    running-max rewrite itself, not a re-implementation of it.
    """
    pairs = skyline_pairs(part)
    # LOCAL prune: per size value only the min-price pair can be on
    # the skyline (equal size, lower price dominates). One keyed
    # window; survivor count is bounded by the size domain.
    w_size = Window.partitionBy("p_size")
    survivors = pairs.withColumn(
        "min_price", F.min("price_cents").over(w_size)
    ).filter(F.col("price_cents") == F.col("min_price")).drop("min_price")
    # GLOBAL pass over the ≤|size-domain| survivors: a pair is on the
    # skyline iff its size strictly exceeds the running max size in
    # (price ASC, size DESC) order.
    wg = (
        Window.orderBy(F.col("price_cents").asc(), F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        survivors.withColumn("cm", F.max("p_size").over(wg))
        .filter(F.col("cm").isNull() | (F.col("p_size") > F.col("cm")))
        .select("price_cents", "p_size", "n_parts", "min_partkey")
    )
