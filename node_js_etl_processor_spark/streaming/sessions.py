"""Structured Streaming surface (north-star streaming extension).

The reference's only "streaming" is a daily cron batch rerun
(reference server.js:264-269). The engine provides real stream
processing over the same event shape as the ``events`` fixture:

- ``windowed_counts``: tumbling-window aggregation with a watermark for
  late data — the streaming twin of q_date_buckets;
- ``session_windows``: gap-based session aggregation via the built-in
  ``session_window`` (the streaming twin of operators/sessionize.py);
- ``file_stream_refresh`` (streaming/refresh.py): availableNow batch
  refresh of the universities pipeline.

All are tested end-to-end in tests/test_streaming.py with file sources
+ memory sinks and ``trigger(availableNow=True)`` so they terminate
deterministically. At scale the same code runs against Kafka with a
real watermark lag; state cleanup is watermark-driven so executor
state stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import ensure_instant


def windowed_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window event counts with late-data watermark."""
    events = ensure_instant(events)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session aggregation via the native session_window —
    state-store backed, watermark-bounded (the scalable form of the
    batch lag/cumsum sessionizer)."""
    events = ensure_instant(events)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts", gap))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
