"""Interval sweep-line via distributed prefix sum: peak concurrency.

"How many intervals overlap at once, and when does the peak occur?" is the
classic sweep-line problem: turn every interval [s, e) into (+1 at s, -1 at
e), sort by time, running-sum the deltas. The naive formulation is a GLOBAL
ordered running sum — a single-partition window that cannot scale.

This operator is the textbook two-phase distributed prefix sum instead:

1. bucket every delta by a coarse time unit (e.g. day);
2. LOCAL running sums inside each bucket (window partitioned by bucket —
   parallel, spill-safe);
3. per-bucket NET sums, prefix-scanned over the bucket relation — which is
   bounded by the CALENDAR, not the data, so its unpartitioned window is a
   few thousand rows at any scale;
4. concurrency at any delta point = bucket carry-in + local running sum.

Tie semantics: deltas are ordered by (time, delta) so ends (-1) sort before
starts (+1) at the same instant — half-open [s, e) intervals that touch do
NOT overlap. Both engines' default RANGE window frame makes tied rows
peers, so the sum at a tie group is the group total on Spark and DuckDB
alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def interval_deltas(
    df: DataFrame, start_col: str, end_col: str, bucket: str = "day"
) -> DataFrame:
    """(t, delta, bucket) rows: +1 at each interval start, -1 at each end."""
    starts = df.select(F.col(start_col).alias("t"), F.lit(1).alias("delta"))
    ends = df.select(F.col(end_col).alias("t"), F.lit(-1).alias("delta"))
    return starts.unionByName(ends).withColumn(
        "bucket", F.date_trunc(bucket, "t")
    )


def peak_concurrency(
    df: DataFrame, start_col: str, end_col: str, bucket: str = "day"
) -> DataFrame:
    """Per-bucket peak number of simultaneously-open [start, end) intervals.

    Returns (bucket, peak) where peak is the maximum concurrency reached at
    any delta point inside the bucket (carry-in from earlier buckets
    included). Two partitioned windows + one calendar-bounded scan."""
    deltas = interval_deltas(df, start_col, end_col, bucket)

    w_local = W.partitionBy("bucket").orderBy("t", "delta")  # default RANGE frame
    local = deltas.withColumn("local_cum", F.sum("delta").over(w_local))

    nets = deltas.groupBy("bucket").agg(F.sum("delta").alias("net"))
    # exclusive prefix over the bucket relation — calendar-bounded, so the
    # unpartitioned window is deliberate and safe (documented contract)
    w_carry = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    carry = nets.select(
        "bucket", F.coalesce(F.sum("net").over(w_carry), F.lit(0)).alias("carry")
    )

    return (
        local.join(carry, "bucket")
        .groupBy("bucket")
        .agg(
            F.max(F.col("carry") + F.col("local_cum")).cast("bigint").alias("peak")
        )
    )
