"""Bucketed range join: points × intervals with NO equi key.

Spark plans a keyless inequality join as BroadcastNestedLoopJoin — a scan
of every (point, interval) pair, the scale failure mode. The standard fix
is temporal bucketing: explode each interval to the coarse buckets it
covers, key each point by its bucket, hash-join on the bucket, then apply
the exact range predicate. Join input is |points| + Σ interval_spans/bucket
rows; each true pair meets in exactly one bucket (the point's), so no
dedup is needed. Pick the bucket width near the median interval length —
wider buckets → fewer replicas but fatter buckets; AQE handles residual
bucket skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET_SECONDS = {"1 hour": 3600, "1 day": 86400, "15 minutes": 900, "1 minute": 60}


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) pairs with ``start <= point_ts <= end``.

    Half-open vs closed bounds are the caller's predicate concern — this
    implements closed ``[start, end]``; adjust the filter for other
    conventions. ``how`` supports only inner (the keyless outer variants
    need the nested-loop fallback)."""
    if how != "inner":
        raise ValueError("interval_point_join supports inner joins only")
    secs = _BUCKET_SECONDS[bucket]
    p = points.withColumn(
        "__bucket", F.floor(F.unix_micros(F.col(point_ts)) / (secs * 1_000_000))
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / (secs * 1_000_000)),
                F.floor(F.unix_micros(F.col(end_col)) / (secs * 1_000_000)),
            )
        ),
    )
    return (
        p.join(i, "__bucket")
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__bucket")
    )
