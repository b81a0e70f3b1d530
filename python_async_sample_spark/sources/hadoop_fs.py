"""Hadoop FileSystem helpers for data-path metadata operations.

Partition probes and deletes on the data path must go through Hadoop's
``FileSystem`` abstraction so the sink behaves identically on ``file://``,
``hdfs://`` and ``s3a://`` targets — ``os.path`` silently reports False for
any non-local URI, which would make an overwrite drop the boundary rows of a
partial-day window on a cluster. These are driver-side metadata calls (one
RPC per touched partition), never a data scan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession, path: str) -> bool:
    """True if ``path`` exists on whatever filesystem its scheme names."""
    fs, jpath = _fs(spark, path)
    return bool(fs.exists(jpath))


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Delete ``path`` (no-op if absent). Returns True if something was
    removed."""
    fs, jpath = _fs(spark, path)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, recursive))


def listdir(spark: SparkSession, path: str) -> list[str]:
    """Child names (not full paths) directly under ``path``; empty if the
    path does not exist."""
    fs, jpath = _fs(spark, path)
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Rename ``src`` to ``dst`` — atomic on HDFS/POSIX; on object stores
    (s3a) a copy+delete, which is why callers keep the renamed unit small
    (one partition directory, not the table)."""
    fs, jsrc = _fs(spark, src)
    jdst = spark._jvm.org.apache.hadoop.fs.Path(dst)
    return bool(fs.rename(jsrc, jdst))
