"""Streaming deduplication with watermark-bounded state.

The streaming twin of the batch dedup family (operators/dedup.py):
incoming events may repeat (at-least-once sources, retried producers),
and the stream must emit each logical event once without keeping
unbounded seen-key state.

- ``dedup_events_stream`` — ``dropDuplicatesWithinWatermark``: state
  for a key is dropped once the watermark passes it, so memory is
  bounded by (watermark lag × event rate) while still absorbing any
  duplicate that arrives within the lag. This is the correct semantics
  for retry-induced duplicates, which arrive close to the original.
- ``dedup_exact_stream`` — plain ``dropDuplicates`` on the key for
  comparison; state grows forever (documented anti-pattern at scale,
  kept for parity with the batch exact-dedup semantics in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.timeutil import ensure_instant


def dedup_events_stream(
    events_stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermark-bounded streaming dedup on ``keys`` (default:
    event_id). Input must be a streaming DataFrame with a ``ts``
    timestamp column."""
    events_stream = ensure_instant(events_stream)
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def dedup_exact_stream(
    events_stream: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """Exact streaming dedup via plain ``dropDuplicates`` on ``keys``
    (default: event_id).

    State-growth warning: without a watermark, the seen-key state grows
    without bound — every key ever observed stays in the state store
    forever. Kept for parity with batch exact-dedup semantics (absorbs
    duplicates arbitrarily far apart); at scale use
    ``dedup_events_stream``, whose state is bounded by watermark lag.
    """
    return events_stream.dropDuplicates(keys or ["event_id"])
