"""Timestamp-flavor-safe epoch helpers.

Parquet timestamps arrive as either TIMESTAMP (isAdjustedToUTC=true)
or TIMESTAMP_NTZ (isAdjustedToUTC=false / inferred NTZ in Spark 4).
``unix_micros`` accepts only the former, and casting NTZ through LTZ
is session-timezone-dependent — wrong for oracle parity against
DuckDB's naive ``epoch_us``.

The NTZ path here is ``timestampdiff(MICROSECOND, NTZ '1970-01-01',
col)``: pure wall-clock arithmetic between two NTZ values, so it is
timezone-independent and equals DuckDB's naive epoch exactly
(verified under a non-UTC session timezone). The LTZ path stays
``unix_micros``. Dispatch happens once per operator on the input
frame's schema, so downstream expressions (lag/min/max/windows over
the micros) are flavor-agnostic bigints.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _quote(name: str) -> str:
    """Backtick-quote a column name for interpolation into SQL text,
    so names that aren't bare identifiers (dots, spaces, reserved
    words) parse as a single column reference."""
    return "`" + name.replace("`", "``") + "`"


def is_ntz(df: DataFrame, col: str) -> bool:
    """True if ``df[col]`` is TIMESTAMP_NTZ."""
    return isinstance(df.schema[col].dataType, TimestampNTZType)


def epoch_us_fn(df: DataFrame, ts_col: str = "ts") -> Callable[[str], Column]:
    """Return ``name -> epoch-microseconds Column``, dispatched once on
    the flavor of ``df[ts_col]``. All timestamp columns the returned
    function is applied to must share that flavor (true for columns
    derived from ``ts_col`` — as-of matches, mins/maxes, lags).
    """
    if is_ntz(df, ts_col):
        return lambda name: F.expr(
            f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {_quote(name)})"
        )
    return lambda name: F.unix_micros(F.col(name))


def ensure_instant(df: DataFrame, cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Rewrite any TIMESTAMP_NTZ column in ``cols`` to TIMESTAMP (an
    instant), treating the wall clock as UTC — timezone-independently,
    via epoch micros (``timestamp_micros(timestampdiff(...))``), never
    through a session-timezone cast.

    Needed at Structured Streaming boundaries: watermarks and event
    time require TIMESTAMP (Spark raises
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ). No-op for columns
    already LTZ.
    """
    for c in cols:
        if is_ntz(df, c):
            df = df.withColumn(
                c,
                F.timestamp_micros(
                    F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {_quote(c)})")
                ),
            )
    return df
