"""A versioned table as a REAL Structured Streaming source — Spark 4's
Python DataSource API (``pyspark.sql.datasource``) over the manifest log,
the "Delta table as a stream source" face of this engine.

Contract: each committed version is one unit of progress; a micro-batch
covering ``(start_version, end_version]`` emits, per version, the rows of
files ADDED by that commit tagged ``_change_type='insert'`` and the rows
of files REMOVED tagged ``'delete'``, plus ``_commit_version``.  Files are
immutable, so this file-granular diff applied to the start snapshot
reproduces the end snapshot EXACTLY as a multiset (an update is its
delete+insert pair; a row rewritten unchanged appears as a matched pair
that cancels on application).  It is :func:`versioned.changes_between`
without the ``exceptAll`` cancellation pass — cancellation needs a shuffle
across files, while this source's unit of parallel work is ONE FILE, so
consumers wanting net-only changes run the cancellation downstream.

Scale design: offsets are version numbers (a dict the engine checkpoints);
``partitions()`` plans from manifest JSON alone — O(changed files) driver
work, no data reads — and ``read()`` runs EXECUTOR-side, one parquet file
per partition via pyarrow, yielding Arrow record batches (the zero-copy
path the Python DataSource API added for exactly this).  The driver never
touches a data row.  Same vacuum caveat as Delta CDF: a CDC stream must
stay within the retention window — a removed file reclaimed by
:func:`versioned.vacuum` before the stream reads it fails loudly, never
silently skips.  Retention must cover the stream's COMMITTED OFFSET
version itself, not merely the unread versions: ``partitions(start, end)``
diffs each manifest against its parent, so resuming from offset v needs
manifest v as the delta BASE (the round-8 scale probe pinned this —
``vacuum(keep_last=1)`` after a drain at offset v1 with head v2 fails the
resume loudly; ``keep_last=2`` reclaims v0 and resumes cleanly).

Usage:
    spark.dataSource.register(VersionedCDCDataSource)
    (spark.readStream.format("versioned_cdc").option("path", root).load()
        .writeStream.foreachBatch(...).trigger(availableNow=True).start())
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_DATA_DIR = "data"
_MANIFEST_DIR = "_manifests"


def _manifest(root: str, version: int) -> dict:
    # the real layout helpers, not a re-derivation that can drift
    from python_async_sample_spark.sources.versioned import _read_manifest

    return _read_manifest(root, version)


def _current_version(root: str) -> int:
    from python_async_sample_spark.sources.versioned import current_version

    return current_version(root)


class _FileChangePartition(InputPartition):
    """One changed data file = one unit of executor work."""

    def __init__(self, path: str, change_type: str, version: int, schema_json: str):
        self.path = path
        self.change_type = change_type
        self.version = version
        self.schema_json = schema_json


class VersionedCDCStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, schema: T.StructType, start_version: int):
        self._root = root
        self._schema = schema
        self._start = start_version

    # -- offsets: {"version": v} means "all commits ≤ v emitted" ---------
    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": _current_version(self._root)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        parts: list[InputPartition] = []
        base_fields = [f.name for f in self._schema.fields[:-2]]
        for v in range(start["version"] + 1, end["version"] + 1):
            m = _manifest(self._root, v)
            prev_files = (
                set(_manifest(self._root, v - 1)["files"]) if v > 0 else set()
            )
            cur_files = set(m["files"])
            # the file's OWN schema (the version that referenced it) is what
            # pyarrow will find on disk; missing columns null-fill to the
            # stream schema, which is pinned at stream start
            for n in sorted(cur_files - prev_files):
                parts.append(_FileChangePartition(
                    f"{self._root}/{_DATA_DIR}/{n}", "insert", v,
                    json.dumps(base_fields),
                ))
            for n in sorted(prev_files - cur_files):
                parts.append(_FileChangePartition(
                    f"{self._root}/{_DATA_DIR}/{n}", "delete", v,
                    json.dumps(base_fields),
                ))
        return parts

    def read(self, partition: _FileChangePartition):  # executor-side
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not os.path.exists(partition.path):
            raise FileNotFoundError(
                f"CDC source: {partition.path} was vacuumed before the "
                "stream read it — the stream fell behind the retention "
                "window (raise vacuum's keep_last/grace, or restart the "
                "stream from a newer offset)"
            )
        base_fields = json.loads(partition.schema_json)
        tbl = pq.read_table(partition.path)
        n = tbl.num_rows
        cols = []
        for name in base_fields:
            if name in tbl.column_names:
                col = tbl.column(name)
                if pa.types.is_timestamp(col.type) and col.type.unit != "us":
                    # Spark writes INT96 by default and pyarrow surfaces it
                    # as nanoseconds, which Spark's Arrow ingestion rejects
                    # — normalize to the microseconds the stream schema
                    # declares
                    col = col.cast(pa.timestamp("us", col.type.tz))
                cols.append(col)
            else:  # pre-evolution file: null-fill the added column
                cols.append(pa.nulls(n))
        cols.append(pa.array([partition.change_type] * n))
        cols.append(pa.array([partition.version] * n, type=pa.int32()))
        out = pa.table(cols, names=[*base_fields, "_change_type", "_commit_version"])
        yield from out.to_batches(max_chunksize=8192)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine's checkpoint; nothing to reclaim


class VersionedCDCDataSource(DataSource):
    """``spark.readStream.format("versioned_cdc")`` — options:
    ``path`` (table root, required), ``startingVersion`` (default -1 =
    emit version 0's content as the first inserts; ``k`` means "changes
    after version k")."""

    @classmethod
    def name(cls) -> str:
        return "versioned_cdc"

    def schema(self) -> T.StructType:
        root = self.options["path"].rstrip("/")
        head = _manifest(root, _current_version(root))
        base = T.StructType.fromJson(json.loads(head["schema"]))
        return base.add(
            T.StructField("_change_type", T.StringType(), False)
        ).add(T.StructField("_commit_version", T.IntegerType(), False))

    def streamReader(self, schema: T.StructType) -> VersionedCDCStreamReader:
        root = self.options["path"].rstrip("/")
        start = int(self.options.get("startingVersion", -1))
        return VersionedCDCStreamReader(root, schema, start)
