"""Event sessionization — gap-based session assignment, pure window algebra.

A standard building block for behavioral pipelines over event streams (the
reference's 7-day TTL window, `02_geofraud_fraud.py:281-287`, is the
coarse version of the same idea: bound "current behavior" by recency).
Sessions let the anomaly profile key on (user, session) granularity
instead of raw history.

100 TB shape: ONE shuffle, keyed by the high-cardinality user id — the
lag and the running session counter share the same window partitioning,
so Catalyst plans a single exchange + sort and both window functions run
in the same physical Window node. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    out_col: str = "session_id",
) -> DataFrame:
    """Assign a per-user session index: a new session starts when the gap
    since the user's previous event exceeds ``gap_seconds``.

    session_id is a 0-based running count of session starts within each
    user (deterministic given (user, ts, tiebreak by all columns via ts
    ordering); equal timestamps share a session).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    # TIMESTAMP_NTZ (e.g. parquet with isAdjustedToUTC=false) has no direct
    # long cast; route through TIMESTAMP — a no-op for zone-aware inputs,
    # a session-timezone reinterpretation for NTZ (get_spark pins UTC).
    sec = F.col(ts_col).cast("timestamp").cast("long")
    gap = sec - F.lag(sec).over(w)
    is_start = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        out_col,
        (
            F.sum(is_start).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.lit(1)
        ).cast("long"),
    )


def session_stats_native(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """`session_stats` on Spark's built-in `session_window` — the same
    rollup ((user, session_start, session_end, n_events, duration_s))
    without the analytic-window pass: one hash aggregation whose sessions
    merge at the aggregate level, so there is no per-user sort and the
    SAME code runs under Structured Streaming (session_window is a
    streaming-supported group key; the lag/running-sum form is not).

    Boundary nuance vs `sessionize`: session_window merges events closer
    than `gap` ([start, start+gap) intervals), while `sessionize` starts a
    new session only when the gap EXCEEDS `gap_seconds` — a gap of
    exactly `gap_seconds` lands in one session there and splits here.
    With real-valued event times exact equality has measure zero; the
    parity test pins agreement on the fixture.
    """
    ts = F.col(ts_col).cast("timestamp")
    return (
        df.groupBy(
            F.col(user_col),
            F.session_window(ts, f"{gap_seconds} seconds").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (F.max(ts.cast("long")) - F.min(ts.cast("long")))
            .cast("long")
            .alias("duration_s"),
        )
        .drop("w")
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """(user, session_id, n_events, session_start, session_end,
    duration_s) — the per-session rollup used for envelope features."""
    s = sessionize(df, user_col, ts_col, gap_seconds)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.max(F.col(ts_col).cast("timestamp").cast("long"))
            - F.min(F.col(ts_col).cast("timestamp").cast("long"))
        )
        .cast("long")
        .alias("duration_s"),
    )
