"""Sketch aggregates — approximate distinct counts and quantiles.

Not in the reference (it has only exact MAX/COUNT/DISTINCT, SURVEY §2.4),
but core to the 100 TB surface: exact countDistinct is a full shuffle of
every distinct value; the sketches below are single-pass, mergeable, and
fixed-size — HyperLogLog++ (`approx_count_distinct`) and the
Greenwald-Khanna-style quantile sketch (`percentile_approx`), both JVM
built-ins with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, group_cols: list[str], target: str, rsd: float = 0.02
) -> DataFrame:
    """Per-group HLL++ distinct estimate (relative standard deviation
    ``rsd``). The shuffle carries one sketch per group per task, not one
    row per distinct value."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(target, rsd=rsd).alias("approx_distinct"),
    )


def approx_quantiles(
    df: DataFrame,
    group_cols: list[str],
    target: str,
    probs: list[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantile-sketch estimates; error ≤ 1/accuracy of rank."""
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(target, list(probs), accuracy).alias("quantiles")
    )
