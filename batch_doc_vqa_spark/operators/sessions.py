"""Gap-based sessionization — batch form.

No reference counterpart (the reference is batch-only); this is part of the
training-data/eventstream surface a web-scale engine needs. Session id =
running count of gap-breaks per user: lag + conditional cumsum over an
ordered window, all JVM-side. One shuffle on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_MINUTES = 30


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign session_idx per user: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    # NTZ-safe epoch seconds (parquet timestamps may be TIMESTAMP_NTZ; the
    # session TZ is pinned to UTC so the wall-clock epoch matches DuckDB's)
    secs = F.col(ts_col).cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return events.withColumn(
        "session_idx", F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = DEFAULT_GAP_MINUTES,
) -> DataFrame:
    """Per-session rollup: bounds, event count, value sum."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
