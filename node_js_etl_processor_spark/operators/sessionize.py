"""Gap-based sessionization over the events stream (north star).

Batch form: pure window functions — ``lag`` to detect >30-minute gaps,
cumulative sum of gap flags as the session index. One shuffle on
user_id; within-partition sorted streaming after that. A Structured
Streaming twin using session_window lives in streaming/sessions.py.

The reference has no session/stream machinery (its "streaming" is a
daily cron rerun, reference server.js:264-269); this is the engine's
stateful-operator extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeutil import epoch_us_fn

GAP_MINUTES = 30


def sessionize(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Assign a session_id per user from inter-event gaps."""
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microsecond gap — float epoch seconds would risk
    # boundary flips vs the SQL oracle's date_diff
    us = epoch_us_fn(events)("ts")
    gap_us = us - F.lag(us).over(w_user)
    new_session = F.when(
        gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint"),
    )


def q_sessionize(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Declared query: per-session rollup (user_id, session_id,
    n_events, sum_value, start/end timestamps)."""
    eus = epoch_us_fn(events)
    return (
        sessionize(events, gap_minutes)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            # epoch-micros bigints: exact integers, immune to cross-engine
            # timestamp precision/rendering differences in the value hash
            # (min/max commute with the monotone epoch conversion)
            F.min(eus("ts")).alias("start_us"),
            F.max(eus("ts")).alias("end_us"),
        )
    )
