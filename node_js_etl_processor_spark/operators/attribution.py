"""Last-touch conversion attribution — r16 declaration CANDIDATE
(built + pytest-oracle-verified in r15; enters the registry when a
window slot opens): for every purchase event, the most recent
click/view by the same user strictly earlier in the stream and
within a 7-day lookback, plus the touch count inside that lookback —
the standard marketing-analytics credit assignment (last non-direct
click), and in pipeline terms the canonical "join each event to its
most recent qualifying predecessor" pattern the as-of join cannot
express when the predecessor must satisfy a predicate.

Determinism contract: the per-user stream is ordered by
(ts, event_id) — a total order — and all time math runs in integer
epoch microseconds through ``timeutil.epoch_us_fn``. The three
last-touch columns are separate IGNORE-NULLS window lasts over the
SAME null pattern, so they always come from the same touch row. The
lookback gate nulls all three together. The touch count uses a RANGE
frame (lookback_us PRECEDING to 1 PRECEDING) on the integer
timestamp, whose peer semantics (equal-ts rows excluded) are SQL
standard — identical in both engines.

Scale shape: ONE hashpartitioning(user_id) exchange feeds every
window (rows frame for last-touch, range frame for the count); the
purchase filter happens after the windows but prunes before anything
wide. No joins at all — the classic self-join formulation
(purchases × touches with a max-ts subquery) is rewritten away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_us_fn

#: attribution lookback: 7 days in microseconds
LOOKBACK_US = 7 * 24 * 3600 * 1_000_000

#: event types that can receive attribution credit
TOUCH_TYPES = ("click", "view")


def q_attribution(events: DataFrame) -> DataFrame:
    """Declared-query candidate: last-touch attribution of every
    purchase. Output one row per purchase:
    (purchase_event_id, user_id, purchase_us, touch_event_id,
    touch_type, gap_us, n_touches_7d) — the three touch columns are
    NULL together when no qualifying touch exists in the lookback."""
    eus = epoch_us_fn(events)
    base = events.select(
        "user_id",
        "event_id",
        "event_type",
        eus("ts").alias("t_us"),
    )
    is_touch = F.col("event_type").isin(*TOUCH_TYPES)
    w_rows = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_range = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us").asc())
        .rangeBetween(-LOOKBACK_US, -1)
    )
    touch = lambda c: F.last(
        F.when(is_touch, F.col(c)), ignorenulls=True
    ).over(w_rows)
    attributed = base.select(
        "user_id",
        "event_id",
        "event_type",
        "t_us",
        touch("event_id").alias("le_id"),
        touch("event_type").alias("le_type"),
        touch("t_us").alias("le_us"),
        F.count(F.when(is_touch, F.lit(1)))
        .over(w_range)
        .cast("long")
        .alias("n_touches_7d"),
    )
    in_window = F.col("le_us").isNotNull() & (
        (F.col("t_us") - F.col("le_us")) <= F.lit(LOOKBACK_US)
    )
    return attributed.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("t_us").alias("purchase_us"),
        F.when(in_window, F.col("le_id")).alias("touch_event_id"),
        F.when(in_window, F.col("le_type")).alias("touch_type"),
        F.when(in_window, F.col("t_us") - F.col("le_us")).alias("gap_us"),
        "n_touches_7d",
    )


#: the DuckDB twin, staged here until the r16 registry wiring
ATTRIBUTION_ORACLE = """
    WITH base AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us
      FROM events
    ), att AS (
      SELECT user_id, event_id, event_type, t_us,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_id END IGNORE NULLS) OVER w_rows AS le_id,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS) OVER w_rows AS le_type,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN t_us END IGNORE NULLS) OVER w_rows AS le_us,
             CAST(count(CASE WHEN event_type IN ('click', 'view')
                             THEN 1 END) OVER w_range AS BIGINT) AS n_touches_7d
      FROM base
      WINDOW w_rows AS (PARTITION BY user_id ORDER BY t_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             w_range AS (PARTITION BY user_id ORDER BY t_us
                         RANGE BETWEEN 604800000000 PRECEDING
                         AND 1 PRECEDING)
    )
    SELECT event_id AS purchase_event_id, user_id, t_us AS purchase_us,
           CASE WHEN le_us IS NOT NULL AND t_us - le_us <= 604800000000
                THEN le_id END AS touch_event_id,
           CASE WHEN le_us IS NOT NULL AND t_us - le_us <= 604800000000
                THEN le_type END AS touch_type,
           CASE WHEN le_us IS NOT NULL AND t_us - le_us <= 604800000000
                THEN t_us - le_us END AS gap_us,
           n_touches_7d
    FROM att WHERE event_type = 'purchase'
"""
