"""Stream-stream joins with watermark-bounded state.

Completes the streaming operator family (windowed aggs, session
windows, custom state, incremental refresh — see sessions.py /
stateful.py / refresh.py): joining two live streams requires both
sides to buffer rows in the state store until the other side's
matching rows can no longer arrive. The watermarks plus the time-range
join condition give Spark the eviction bound — without them the state
grows forever, which is why this operator REQUIRES both.

Scale: state is partitioned by the join key (one shuffle per side);
per-key state size is bounded by (watermark lag + join window) × event
rate. The reference has no streaming at all (daily cron rerun,
reference server.js:264-269).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import ensure_instant


def clicks_to_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Attribute each purchase to same-user clicks in the preceding
    attribution window (inner stream-stream join).

    Both inputs are STREAMING DataFrames with (user_id, ts, event_id).
    The join condition pairs the key equality with a time-range bound —
    the form Spark requires to evict state: a click older than
    (purchase watermark − window) can never match again and is dropped
    from the store.
    """
    clicks = ensure_instant(clicks)
    purchases = ensure_instant(purchases)
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        F.unix_micros("purchase_ts").alias("purchase_us"),
        F.unix_micros("click_ts").alias("click_us"),
    )
