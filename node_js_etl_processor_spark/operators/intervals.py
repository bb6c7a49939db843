"""Interval coverage: merge each user's overlapping event intervals
into maximal disjoint "islands" — the classic gaps-and-islands /
interval-union operator behind utilization, uptime and
billable-coverage queries (and, in a training-data pipeline, span
coalescing before span-level dedup). Standard sweep-line form: order
a key's intervals by start, open a new island whenever a start
strictly exceeds the running max end, then aggregate per island.

Parity note: the reference (reference server.js:1-302) has no
temporal surface; this extends the engine's temporal family
(``operators/temporal.py`` — range/as-of joins, gap fill, rollups)
with the interval-union tier.

Determinism contract: each event's interval is
``[ts, ts + round(value·100) seconds)`` — the fixture's positive
2-decimal ``value`` as an exact integer duration (the money-cents
discipline: never a float-truncation cast). All time math runs in
epoch microseconds through ``timeutil.epoch_us_fn``, so both
TIMESTAMP flavors of the fixture work and the DuckDB oracle
(``epoch_us(ts)``) lands on identical integers. Island membership is
insensitive to the order of equal (start, end) rows — the running
max is commutative — so the per-key windows tie-break on event_id
only for a stable rank, not for correctness.

Scale shape: both windows and the final aggregation partition by
user_id — ONE keyed shuffle reused across the whole plan (sort
within partitions, no global ordering anywhere). This is the
sessionize discipline applied to intervals; at 100 TB the plan is a
single hash exchange on the key followed by embarrassingly parallel
per-key sweeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_us_fn

#: one "cent" of the fixture's value column = one second of duration
_US_PER_CENT = 1_000_000


def event_intervals(events: DataFrame) -> DataFrame:
    """(user_id, event_id, s_us, e_us): the event's interval in epoch
    microseconds — start = ts, end = ts + round(value·100) seconds."""
    eus = epoch_us_fn(events)
    s = eus("ts")
    dur_us = (
        F.round(F.col("value") * 100, 0).cast("long") * F.lit(_US_PER_CENT)
    )
    return events.select(
        "user_id",
        "event_id",
        s.alias("s_us"),
        (s + dur_us).alias("e_us"),
    )


def merge_intervals(iv: DataFrame, key: str = "user_id") -> DataFrame:
    """Sweep-line interval union per key: returns one row per island
    (key, island_start_us, island_end_us, n_events, span_us).

    An island opens when a start strictly exceeds the max end of all
    earlier intervals (touching intervals merge: s == max_e extends).
    """
    order = [F.col("s_us").asc(), F.col("e_us").asc(), F.col("event_id").asc()]
    w_prev = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_max_e = F.max("e_us").over(w_prev)
    opens = F.when(
        prev_max_e.isNull() | (F.col("s_us") > prev_max_e), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        iv.withColumn("opens", opens)
        .withColumn("island", F.sum("opens").over(w_run))
        .groupBy(key, "island")
        .agg(
            F.min("s_us").cast("long").alias("island_start_us"),
            F.max("e_us").cast("long").alias("island_end_us"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            key,
            "island_start_us",
            "island_end_us",
            "n_events",
            (F.col("island_end_us") - F.col("island_start_us")).alias("span_us"),
        )
    )


def q_interval_coverage(events: DataFrame) -> DataFrame:
    """Declared query: per-user merged interval islands over events —
    one row per maximal overlapping run, with its bounds, event count
    and covered span. The DuckDB oracle replays the same sweep with
    its own window functions over identical integer microseconds."""
    return merge_intervals(event_intervals(events))
