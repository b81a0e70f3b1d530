"""Time-series resampling: fixed-interval grids with forward fill.

The operator relational engines lack natively: turn an irregular event
stream into a regular per-key time grid (one row per key per interval),
carrying the last observation forward across empty intervals. The fab
analog is sensor/metrology readings sampled onto the process clock; the
training-data analog is activity matrices from event logs.

Plan shape for 100 TB: one aggregation to per-(key, bucket) observations,
a per-key ``sequence``+``explode`` grid (rows ∝ key-count × grid length,
never event-count), one left join bucket-to-bucket, and one ordered window
per key for the fill — no cross joins, no per-row Python, and every stage
partitions on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    interval_s: int = 3600,
) -> DataFrame:
    """Per-key regular grid from each key's first to last bucket, with the
    last-in-bucket observation (ties broken by ``order_col``) carried
    forward across empty buckets.

    Returns (key, bucket, n_events, value): ``bucket`` is the epoch
    interval index, ``n_events`` counts raw rows in the bucket (0 for
    filled rows), ``value`` is the forward-filled observation (null until
    the key's first observation).
    """
    us = interval_s * 1_000_000
    # floor, not a truncating cast: they differ for pre-epoch (negative)
    # timestamps, and the q92 oracle floors
    bucket = F.floor(F.unix_micros(F.col(ts_col)) / us).cast("bigint")
    rn = W.partitionBy(key_col, "bucket").orderBy(
        F.desc(ts_col), F.desc(order_col)
    )
    obs = (
        df.withColumn("bucket", bucket)
        .withColumn("__rn", F.row_number().over(rn))
        .groupBy(key_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("__rn") == 1, F.col(value_col))).alias("__obs"),
        )
    )
    grid = (
        obs.groupBy(key_col)
        .agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
        .select(
            key_col,
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("bucket"),
        )
    )
    filled = grid.join(obs, [key_col, "bucket"], "left")
    w = (
        W.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return filled.select(
        F.col(key_col),
        "bucket",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("__obs", ignorenulls=True).over(w).alias("value"),
    )
