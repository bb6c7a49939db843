"""RFM customer segmentation — DECLARED in r17 (built +
staged-oracle-verified in r16): the classic recency / frequency /
monetary quintile segmentation (Hughes, "Strategic Database
Marketing", 1994 — the standard warehouse cohorting operator), over
every customer with at least one order.

Determinism contract: every metric is an exact integer — recency as
DAYS since epoch of the latest order date, frequency as the order
count, monetary as the cent sum (round(price·100), the skyline money
discipline) — and each quintile is assigned by the closed form
``seg = (5 · (rank − 1)) div n`` over the TOTAL order
(metric, custkey), custkey breaking metric ties. No ntile(): its
extra-row placement is engine-convention; the div form is TRUE
integer division on both sides (Spark ``div``, DuckDB ``//`` —
r16 review: ``floor(a/b)`` would be IEEE double division in both
engines, exact only below 2^53). Segments run 0..4 ascending in the
metric (recency 4 = most recent, frequency 4 = most orders,
monetary 4 = highest spend).

Scale shape: one keyed aggregation (orders → per-customer metrics),
then THREE distributed global ranks — the ``operators/snm.py``
range-repartition + local row_number + broadcast-offsets rewrite, the
engine's only total-order pattern, reused — over the
customer-dimension-sized metric frame (never the orders fact), with
``n`` computed ONCE driver-side from the checkpointed metric frame
and each segment checkpointed so range sampling never re-executes
the previous rank's lineage. No single-task window ever sees the
whole frame.

The DuckDB oracle is the deliberately single-machine form (three
plain ROW_NUMBER windows + the same floor arithmetic), so the
distributed rank rewrite is what the compare checks — on all three
metrics at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .snm import global_rank


def rfm_metrics(orders: DataFrame) -> DataFrame:
    """(custkey, recency_days, n_orders, monetary_cents) per customer
    with ≥ 1 order — all exact BIGINT."""
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(F.max("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("recency_days"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )


def _segment(metrics: DataFrame, col: str, seg: str, n: int) -> DataFrame:
    """Attach quintile ``seg`` for metric ``col``: the distributed
    global rank over (col, custkey), then ``(5·(rn−1)) div n`` —
    true integer division, ``n`` a driver-side scalar computed ONCE
    by the caller (r16 review: no per-segment count re-aggregation,
    no crossJoin). Checkpointed so the next segment's range sampling
    never re-executes this one's rank lineage."""
    ranked = global_rank(metrics, [col, "custkey"])
    return (
        ranked.withColumn(
            seg, F.expr(f"(5 * (rn - 1)) div CAST({n} AS BIGINT)")
        )
        .drop("rn")
        .localCheckpoint(eager=True)
    )


def q_rfm_segments(orders: DataFrame) -> DataFrame:
    """Declared query (r17): (custkey, recency_days, n_orders,
    monetary_cents, r_seg, f_seg, m_seg) — see the module
    docstring."""
    m = rfm_metrics(orders).localCheckpoint(eager=True)
    n = m.count()  # one cheap job over the checkpointed frame
    out = _segment(m, "recency_days", "r_seg", n)
    out = _segment(out, "n_orders", "f_seg", n)
    out = _segment(out, "monetary_cents", "m_seg", n)
    return out.select(
        "custkey",
        "recency_days",
        "n_orders",
        "monetary_cents",
        "r_seg",
        "f_seg",
        "m_seg",
    )


#: the DuckDB twin, registry-wired in r17 — the
#: single-machine ROW_NUMBER form, cross-checking the distributed
#: rank rewrite on all three metrics
RFM_SEGMENTS_ORACLE = """
    WITH m AS (
      SELECT o_custkey AS custkey,
             CAST(datediff('day', DATE '1970-01-01', max(o_orderdate))
                  AS BIGINT) AS recency_days,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
    r AS (
      SELECT m.*,
             row_number() OVER (ORDER BY recency_days, custkey) AS rr,
             row_number() OVER (ORDER BY n_orders, custkey) AS rf,
             row_number() OVER (ORDER BY monetary_cents, custkey) AS rm
      FROM m
    )
    SELECT custkey, recency_days, n_orders, monetary_cents,
           CAST((5 * (rr - 1)) // n.n AS BIGINT) AS r_seg,
           CAST((5 * (rf - 1)) // n.n AS BIGINT) AS f_seg,
           CAST((5 * (rm - 1)) // n.n AS BIGINT) AS m_seg
    FROM r, n
"""
