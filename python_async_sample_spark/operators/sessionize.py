"""Sessionization: split each user's event stream into gap-bounded sessions.

The classic training-data / clickstream operator: a new session starts when
the gap since the user's previous event exceeds the timeout. Expressed as
two window functions (lag + running sum of session-start flags) — pure
JVM-side, one shuffle on the user key, no Python. The same semantics run
in Structured Streaming via ``F.session_window`` (see streaming/jobs.py).

All gap arithmetic is integer microseconds (``unix_micros``) so the result
is bit-exact across engines — casting timestamps to long seconds would
truncate sub-second gaps differently per engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Tag each event with its session number (1-based per user).

    ``order_col`` breaks equal-timestamp ties so session assignment is
    deterministic. One hash shuffle on ``user_col``; at 100 TB the sort is
    per-partition (no global sort) and skewed users are the only hazard —
    mitigated by AQE skew handling since sessions never cross users.
    """
    w = W.partitionBy(user_col).orderBy(ts_col, order_col)
    tus = F.unix_micros(F.col(ts_col))
    gap_us = tus - F.lag(tus).over(w)
    is_new = F.when(gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    running = W.partitionBy(user_col).orderBy(ts_col, order_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return df.withColumn("session_no", F.sum(is_new).over(running).cast("bigint"))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """One row per session: event count and [start, end] in epoch micros."""
    tagged = sessionize(df, user_col, ts_col, order_col, gap_minutes)
    tus = F.unix_micros(F.col(ts_col))
    return tagged.groupBy(user_col, "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(tus).alias("start_us"),
        F.max(tus).alias("end_us"),
    )
