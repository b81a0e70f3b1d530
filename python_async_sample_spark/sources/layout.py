"""Table file-layout maintenance: small-file compaction and range clustering.

At 100 TB the dominant operational failure isn't a wrong plan — it's a
table whose physical layout fights every plan: thousands of KB-sized files
(one per micro-batch/task) make listing and scan startup the bottleneck,
and unclustered files defeat parquet row-group min/max pruning so every
filter reads everything.

Two maintenance verbs, both plain Spark jobs a scheduler can run per
partition:

* :func:`compact` — rewrite a directory into ~``target_file_mb`` files.
  The file count derives from the ACTUAL input bytes (one driver-side
  Hadoop ``getContentSummary`` RPC, never a data scan).
* :func:`cluster_by` — compact AND range-partition + sort by the given
  columns, so each output file owns a disjoint key range and its parquet
  footer min/max prunes reads (the poor man's Z-order; for one sort key it
  is exactly what an OPTIMIZE ... ZORDER BY single-column run produces).

Both write to a NEW directory and never mutate the input in place — swap is
the caller's atomic-rename/metastore step, mirroring the delete-then-insert
discipline of ``incremental/sink``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from python_async_sample_spark.sources.readers import pin_reader_conf


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` — one metadata RPC on whatever filesystem
    the scheme names (file://, hdfs://, s3a://)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(jpath).getLength())


def target_file_count(spark: SparkSession, path: str, target_file_mb: int) -> int:
    return max(1, math.ceil(dir_bytes(spark, path) / (target_file_mb * 1024 * 1024)))


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 128,
    n_files: int | None = None,
) -> DataFrame:
    """Rewrite ``in_path`` into ~``target_file_mb``-sized parquet files at
    ``out_path``; returns the compacted scan. Content is bit-identical —
    only the file layout changes. ``n_files`` overrides the size-derived
    count when the caller already knows the layout it wants."""
    pin_reader_conf(spark)
    n = n_files or target_file_count(spark, in_path, target_file_mb)
    spark.read.parquet(in_path).repartition(n).write.mode("error").parquet(out_path)
    return spark.read.parquet(out_path)


def cluster_by(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    cols: list[str],
    target_file_mb: int = 128,
    n_files: int | None = None,
) -> DataFrame:
    """Compact AND cluster: range-partition the rows by ``cols`` into the
    target file count and sort within each file, so every output file owns
    a (nearly) disjoint ``cols`` range and row-group min/max statistics
    prune scans that filter on them."""
    pin_reader_conf(spark)
    n = n_files or target_file_count(spark, in_path, target_file_mb)
    (
        spark.read.parquet(in_path)
        .repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("error")
        .parquet(out_path)
    )
    return spark.read.parquet(out_path)
