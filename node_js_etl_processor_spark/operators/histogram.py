"""Equi-depth histograms per group — r17 declaration CANDIDATE
(built + staged-oracle-verified in r16): the classic database
statistics structure (Piatetsky-Shapiro & Connell, SIGMOD 1984,
"Accurate Estimation of the Number of Tuples Satisfying a
Condition"; the variance-minimizing V-optimal/equi-depth line of
Ioannidis, VLDB 2003 survey) — B buckets each holding n/B rows, with
observed [lo, hi] value bounds per bucket. A pipeline reads these
for selectivity estimation, partition-boundary planning (the same
range boundaries a range-partitioner wants), and drift monitoring
(compare this week's bucket bounds to last week's).

Determinism contract: values are exact integer cents; bucket
assignment is NTILE(B) over (cents, l_orderkey, l_linenumber) — both
engines implement SQL-standard NTILE (first n mod B buckets take the
extra row) over the identical total order, so membership can never
be ambiguous on ties. Everything emitted (bucket, n, lo_cents,
hi_cents) is BIGINT; the compare is bitwise.

Scale shape: one narrow projection, one window over a single
hashpartitioning(l_returnflag) exchange with an in-partition sort,
one keyed aggregation inside the same partitioning. The per-group
sort is the honest order-statistic requirement (the same contract
q_robust_stats documents); parallelism is across groups. At 100 TB
the practical variant samples before ranking (Spark's own
RangePartitioner does exactly this) or swaps approx_percentile's
t-digest boundaries for the exact NTILE — same output shape, and the
exact form stays the correctness oracle for the approximate one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: bucket count — interpolated into the staged oracle so engine and
#: oracle can never drift.
N_BUCKETS = 8


def q_equidepth_hist(lineitem: DataFrame, n_buckets: int = N_BUCKETS) -> DataFrame:
    """r17 declaration CANDIDATE: per-returnflag equi-depth histogram
    of extended price — (l_returnflag, bucket, n, lo_cents, hi_cents),
    all BIGINT (module docstring has the NTILE parity argument)."""
    base = lineitem.filter(F.col("l_extendedprice").isNotNull()).select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cents").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    return (
        base.withColumn("bucket", F.ntile(n_buckets).over(w).cast("bigint"))
        .groupBy("l_returnflag", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


#: the DuckDB twin, staged until the r17 registry wiring — identical
#: total order, identical SQL-standard NTILE, identical BIGINT bounds.
EQUIDEPTH_HIST_ORACLE = f"""
    WITH base AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             l_orderkey, l_linenumber
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), ranked AS (
      SELECT l_returnflag, cents,
             CAST(ntile({N_BUCKETS}) OVER (
               PARTITION BY l_returnflag
               ORDER BY cents, l_orderkey, l_linenumber) AS BIGINT) AS bucket
      FROM base
    )
    SELECT l_returnflag, bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(cents) AS BIGINT) AS lo_cents,
           CAST(max(cents) AS BIGINT) AS hi_cents
    FROM ranked GROUP BY l_returnflag, bucket
"""
