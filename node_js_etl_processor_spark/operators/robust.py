"""Exact per-group robust statistics (median / MAD) in pure integer
arithmetic — r17 declaration CANDIDATE (built + staged-oracle-
verified in r16): the robust location/scale pair (Hampel 1974; the
MAD as the robust sigma — Leys et al. 2013's outlier-detection
standard) that q_stats_agg's moment statistics cannot provide, and
that naive cross-engine implementations get WRONG: Spark
``percentile()`` and DuckDB ``quantile_cont`` both interpolate
even-count medians in IEEE doubles, where a 1-ulp divergence flips a
rounded digit (the repo's r4 money-average lesson).

The twice-median trick makes everything exact: for n values the
DOUBLED median ``med2 = v[lo] + v[hi]`` with ``lo = (n+1) div 2`` and
``hi = n div 2 + 1`` (equal for odd n — the middle value counted
twice) is always an INTEGER of the input's unit. The deviations
``d = |2·v − med2| = 2·|v − median|`` are then integers too, and the
doubled median of d is ``4·MAD`` — so the emitted columns
(n, med2_cents = 2·median, mad4_cents = 4·MAD) are all BIGINT and
the compare is bitwise; the consumer divides at the end, exactly the
PMI/lift sufficient-statistics discipline.

Scale shape: ONE hashpartitioning(group) exchange reused by BOTH
order-statistic windows (same partitioning; the second window's sort
key d is derived, so only an in-partition re-sort happens) and both
group-sized aggregations; the med2 join-back is a broadcast of one
row per group. Per-group sorts are the honest order-statistic
requirement — parallelism across groups, never a global sort. Ties
inside the sort are broken by the row key so both engines rank
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_median2(
    df: DataFrame, grp: str, val: str, key: str, out: str
) -> DataFrame:
    """One row per group: (grp, n, ``out`` = doubled median of
    ``val``) — v[lo] + v[hi] over the (val, key) order, the middle
    value counted twice for odd n."""
    w = Window.partitionBy(grp).orderBy(F.col(val).asc(), F.col(key).asc())
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(Window.partitionBy(grp))
    )
    lo = F.expr("(_n + 1) div 2")
    hi = F.expr("_n div 2 + 1")
    return ranked.groupBy(grp).agg(
        F.max("_n").cast("bigint").alias("n"),
        (
            F.sum(F.when(F.col("_rn") == lo, F.col(val)))
            + F.sum(F.when(F.col("_rn") == hi, F.col(val)))
        )
        .cast("bigint")
        .alias(out),
    )


def q_robust_stats(orders: DataFrame) -> DataFrame:
    """r17 declaration CANDIDATE: per-priority robust price
    statistics — (o_orderpriority, n, med2_cents, mad4_cents), all
    BIGINT (module docstring has the doubling conventions)."""
    base = orders.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_orderkey").alias("k"),
    )
    med = grouped_median2(base, "o_orderpriority", "cents", "k", "med2_cents")
    dev = base.join(
        F.broadcast(med.select("o_orderpriority", "med2_cents")),
        "o_orderpriority",
    ).select(
        "o_orderpriority",
        F.abs(2 * F.col("cents") - F.col("med2_cents")).alias("d"),
        "k",
    )
    mad = grouped_median2(dev, "o_orderpriority", "d", "k", "mad4_cents")
    return med.join(mad.drop("n"), "o_orderpriority").select(
        "o_orderpriority", "n", "med2_cents", "mad4_cents"
    )


#: the DuckDB twin, staged until the r17 registry wiring — identical
#: doubled-order-statistic arithmetic, NO quantile functions anywhere
ROBUST_STATS_ORACLE = """
    WITH base AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey AS k
      FROM orders
    ), r1 AS (
      SELECT o_orderpriority, cents,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY cents, k) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM base
    ), med AS (
      SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n,
             CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN cents END)
                  + sum(CASE WHEN rn = n // 2 + 1 THEN cents END)
                  AS BIGINT) AS med2_cents
      FROM r1 GROUP BY o_orderpriority
    ), dev AS (
      SELECT b.o_orderpriority, abs(2 * b.cents - m.med2_cents) AS d, b.k
      FROM base b JOIN med m USING (o_orderpriority)
    ), r2 AS (
      SELECT o_orderpriority, d,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY d, k) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM dev
    ), mad AS (
      SELECT o_orderpriority,
             CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN d END)
                  + sum(CASE WHEN rn = n // 2 + 1 THEN d END)
                  AS BIGINT) AS mad4_cents
      FROM r2 GROUP BY o_orderpriority
    )
    SELECT med.o_orderpriority, med.n, med.med2_cents, mad.mad4_cents
    FROM med JOIN mad USING (o_orderpriority)
"""
