"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windowed/session aggregations (streaming/sessions.py)
cover time-bucketed state; this module is the escape hatch for
arbitrary per-key state machines the declarative API can't express —
here, a per-user running profile (lifetime event count, value total,
last-seen timestamp) maintained across micro-batches.

Scale design: state lives in the executor state store partitioned by
the grouping key (one shuffle per micro-batch, keyed like any
aggregation); the user function sees Arrow-batched pandas frames, so
per-key processing is vectorized, not row-at-a-time. State size is
O(distinct keys) — bounded by construction here (fixed-width struct);
unbounded-state operators must pair with a timeout
(GroupStateTimeout.ProcessingTimeTimeout) to evict idle keys.

The reference has no streaming at all (its "schedule" is a daily cron
batch rerun, reference server.js:264-269); this is a north-star
extension.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("lifetime_events", LongType(), False),
        StructField("lifetime_value", DoubleType(), False),
        StructField("last_seen_us", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("total", DoubleType(), False),
        StructField("last_us", LongType(), False),
    ]
)


def _update_profile(key, pdf_iter: Iterator, state: GroupState) -> Iterator:
    """Merge this micro-batch's rows for one user into running state and
    emit the updated profile (one row per user per batch)."""
    import pandas as pd

    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "lifetime_events": [n],
            "lifetime_value": [round(total, 2)],
            "last_seen_us": [last_us],
        }
    )


def running_user_profiles(events_stream: DataFrame) -> DataFrame:
    """Per-user lifetime profile over a stream of events — custom
    stateful operator (applyInPandasWithState).

    Input must be a STREAMING DataFrame with columns
    (user_id long, ts timestamp, value double); emits one updated
    profile row per active user per micro-batch. Operator output mode
    is ``append`` (each emitted row is final for its batch) so the
    query composes with append-only sinks (parquet/Kafka) AND survives
    checkpoint recovery — the downstream consumer takes the max
    lifetime_events per user for the current snapshot.
    """
    from ..functions.timeutil import epoch_us_fn

    prepared = events_stream.select(
        "user_id", epoch_us_fn(events_stream)("ts").alias("ts_us"), "value"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=RUNNING_PROFILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
