"""Idempotent overwrite-window sink — the reference's delete-then-insert (I3).

Reference: before re-inserting an interval the ETL deletes the target rows in
``(psql_wm, ora_wm]`` (``dbs/nikon.py:117-145``; callers
``nikon_ETL.py:350-357,410-419``) so re-delivery of a window is exactly-once.

Spark mapping: the target is a parquet table partitioned by event date
(``dt``). Rewriting a window rewrites only the date partitions the window
touches (``spark.sql.sources.partitionOverwriteMode=dynamic``); rows in those
partitions that fall *outside* the half-open window are read back and
retained. At 100 TB the windows are day-aligned (the reference's catch-up
chunk is exactly 86 400 s) so the read-back side is empty and each iteration
rewrites whole partitions — no table-wide shuffle, no delete scan.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DT_COL = "__dt"


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

    new_rows = df.where((F.col(ts_col) > F.lit(lo)) & (F.col(ts_col) <= F.lit(hi)))
    new_rows = new_rows.withColumn(DT_COL, F.date_format(F.col(ts_col), "yyyy-MM-dd"))

    # Keep rows that live in the touched partitions but outside the window
    # (partial first/last day). Only partitions that already exist on disk
    # need the read-back — during forward catch-up none do, so each chunk is
    # a pure write. Day-aligned windows keep this set empty at any scale.
    touched = []
    d = lo.date()
    while d <= hi.date():
        part_dir = f"{target_path}/{DT_COL}={d.isoformat()}"
        if os.path.exists(part_dir):
            touched.append(part_dir)
        d += timedelta(days=1)

    if touched:
        existing = spark.read.option("basePath", target_path).parquet(*touched)
        keep = existing.where(
            ~((F.col(ts_col) > F.lit(lo)) & (F.col(ts_col) <= F.lit(hi)))
        )
        # Materialize the retained boundary rows before overwriting the path
        # they were read from (Spark refuses overlapping read/write paths).
        keep = keep.localCheckpoint(eager=True)
        out = keep.unionByName(new_rows)
    else:
        out = new_rows

    out.write.mode("overwrite").partitionBy(DT_COL).parquet(target_path)


def read_target(spark: SparkSession, target_path: str) -> DataFrame:
    """Read the sink back, dropping the physical partition column."""
    return spark.read.parquet(target_path).drop(DT_COL)
