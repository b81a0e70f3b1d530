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


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of a key column as a (row, col, cnt) relation.

    Each item increments one counter per hash row (xxhash64 seeded by the
    row index, modulo ``width``), so the build is one explode (depth rows
    per item) + one map-side-combinable groupBy bounded at depth*width
    cells. Two sketches built this way MERGE by summing cells — the
    additive contract that lets 100 TB build per-partition sketches and
    combine, and the same mergeability family as q107's partial
    aggregates."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    F.pmod(
                        F.xxhash64(F.col(key_col).cast("string"), F.lit(i)), width
                    ).cast("int").alias("col"),
                )
                for i in range(depth)
            ]
        )
    )
    return (
        df.select(rows.alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame, sketch: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-frequency estimates: est(k) = min over rows of the counter at
    (row, hash_row(k)). The sketch relation is bounded at depth*width cells
    BY CONSTRUCTION, so broadcasting it is legitimate (contrast
    vocabulary-sized relations, which never are). CMS never underestimates;
    the overestimate is <= e/width * N with prob 1 - e^-depth per key."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            F.xxhash64(F.col(key_col).cast("string"), F.lit(i)), width
                        ).cast("int").alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(key_col, F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est_count"))
    )
