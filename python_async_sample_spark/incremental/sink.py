"""Idempotent overwrite-window sink — the reference's delete-then-insert (I3).

Reference: before re-inserting an interval the ETL deletes the target rows in
``(psql_wm, ora_wm]`` (``dbs/nikon.py:117-145``; callers
``nikon_ETL.py:350-357,410-419``) so re-delivery of a window is exactly-once.

Spark mapping: the target is a parquet table partitioned by event date
(``dt``). Rewriting a window first reads back the out-of-window boundary rows
of the date partitions the window touches, then deletes those partitions and
writes boundary ∪ new — a literal delete-then-insert, so a re-delivered
window that *retracts* rows (even a whole day) converges too; dynamic
partition overwrite alone cannot delete a partition that ends up empty. At
100 TB the windows are day-aligned (the reference's catch-up chunk is exactly
86 400 s) so the read-back side is empty and each iteration rewrites whole
partitions — no table-wide shuffle, no delete scan. All partition metadata
ops go through the Hadoop FileSystem API (``sources/hadoop_fs``), so the sink
is scheme-agnostic (file/hdfs/s3a). Crash-consistency matches the reference:
a failure between delete and insert leaves the window absent until the next
(idempotent) re-delivery.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_async_sample_spark.sources import hadoop_fs

DT_COL = "__dt"


def _utc_lit(dt: datetime) -> F.Column:
    """Timestamp literal pinned to UTC wall time.

    ``F.lit(naive_datetime)`` converts through the driver's LOCAL timezone
    (``time.mktime``), so on a non-UTC driver the window predicate shifts by
    the UTC offset and boundary rows are silently lost. Routing through
    integer microseconds makes the literal a pure function of the naive-UTC
    wall time this subsystem uses everywhere."""
    from datetime import timezone as _tz

    us = int(dt.replace(tzinfo=_tz.utc).timestamp() * 1_000_000)
    return F.timestamp_micros(F.lit(us))


def overwrite_window(
    df: DataFrame,
    target_path: str,
    ts_col: str,
    lo: datetime,
    hi: datetime,
) -> None:
    """Idempotently replace the half-open window ``(lo, hi]`` of the target
    with ``df``'s rows in that window."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    new_rows = df.where((F.col(ts_col) > _utc_lit(lo)) & (F.col(ts_col) <= _utc_lit(hi)))
    new_rows = new_rows.withColumn(DT_COL, F.date_format(F.col(ts_col), "yyyy-MM-dd"))

    # Existing partitions the window touches. Only those need the boundary
    # read-back — during forward catch-up none exist, so each chunk is a pure
    # write. Day-aligned windows keep this set empty at any scale.
    touched = []
    d = lo.date()
    while d <= hi.date():
        part_dir = f"{target_path}/{DT_COL}={d.isoformat()}"
        if hadoop_fs.exists(spark, part_dir):
            touched.append(part_dir)
        d += timedelta(days=1)

    if touched:
        existing = spark.read.option("basePath", target_path).parquet(*touched)
        keep = existing.where(
            ~((F.col(ts_col) > _utc_lit(lo)) & (F.col(ts_col) <= _utc_lit(hi)))
        )
        # Materialize the retained boundary rows before deleting the
        # partitions they were read from.
        keep = keep.localCheckpoint(eager=True)
        out = keep.unionByName(new_rows)
        # Delete-then-insert: a touched partition whose every row was
        # retracted upstream must vanish, and dynamic overwrite only rewrites
        # partitions present in `out`.
        for part_dir in touched:
            hadoop_fs.delete(spark, part_dir)
    else:
        out = new_rows

    out.write.mode("overwrite").partitionBy(DT_COL).parquet(target_path)


def read_target(spark: SparkSession, target_path: str) -> DataFrame:
    """Read the sink back, dropping the physical partition column."""
    return spark.read.parquet(target_path).drop(DT_COL)
