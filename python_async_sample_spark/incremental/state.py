"""Watermark state store — the reference's ``lastendtime`` table (I1/I5).

Reference: per-(toolid, apname) high-water mark read at ``dbs/nikon.py:19-37``
and advanced only after a successful batch at ``dbs/nikon.py:169-186`` /
``nikon_ETL.py:327-336`` (write-watermark-last ordering).

The store is a tiny parquet table — one row per pipeline, never data-sized —
so it is read and written **driver-side via pyarrow**, not as Spark jobs: the
reference pays one 1-row UPDATE per advance (``dbs/nikon.py:169-186``) and a
distributed job for that row would be pure scheduler overhead (measured ~4 s
per advance on local[32]). I/O goes through ``pyarrow.fs`` resolved from the
path's URI scheme, so the store works on local paths and on hdfs://​/s3://
alike; the write is staged-then-moved, which is atomic on POSIX and HDFS but
copy+delete on object stores.

**Concurrency contract: single writer per store path.** The reference has
exactly one ETL driver advancing ``lastendtime`` (``nikon_ETL.py:627-632``
runs the stages sequentially) and this store inherits that design: writers
rewrite the whole (tiny) file, so two concurrent advances race whole-file —
last writer wins, no torn file on POSIX/HDFS (rename is atomic), but the
loser's row-level update is overwritten if both buffered before either
wrote. ``test_incremental`` pins the last-writer-wins behavior. Multiple
concurrent pipelines must either use distinct store paths or fill this slot
with a transactional table (Delta/JDBC) — the access pattern (read at
start, written once per committed window) is identical either way, and the
data plane is untouched.
"""

from __future__ import annotations

import posixpath
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyarrow import fs as pafs
from pyspark.sql import SparkSession

ARROW_SCHEMA = pa.schema(
    [
        pa.field("toolid", pa.string(), nullable=False),
        pa.field("apname", pa.string(), nullable=False),
        pa.field("last_end_time", pa.timestamp("us"), nullable=True),
        # 'TRUE'/'FALSE' strings, like the reference (dbs/nikon.py:28)
        pa.field("enabled", pa.string(), nullable=True),
        pa.field("virtual_recipe", pa.string(), nullable=True),
        pa.field("update_time", pa.timestamp("us"), nullable=True),
    ]
)

_FILE = "lastendtime.parquet"


class WatermarkStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark  # kept for API symmetry / future JDBC-backed store
        if "://" in path:
            self._fs, self.path = pafs.FileSystem.from_uri(path)
        else:
            self._fs, self.path = pafs.LocalFileSystem(), path
        self._cache: dict[tuple[str, str], dict] | None = None

    @property
    def _file(self) -> str:
        return posixpath.join(self.path, _FILE)

    def _rows(self) -> dict[tuple[str, str], dict]:
        if self._cache is None:
            info = self._fs.get_file_info(self._file)
            if info.type != pafs.FileType.NotFound:
                loaded = pq.read_table(self._file, filesystem=self._fs).to_pylist()
            else:
                loaded = []
            self._cache = {(r["toolid"], r["apname"]): r for r in loaded}
        return self._cache

    def get(self, toolid: str, apname: str) -> datetime | None:
        """Read one pipeline's watermark (reference: ``get_lastendtime``,
        enabled-gated, ``dbs/nikon.py:26-29``)."""
        row = self._rows().get((toolid.upper(), apname))
        if row is None or row["enabled"] != "TRUE":
            return None
        return row["last_end_time"]

    def put(self, toolid: str, apname: str, wm: datetime) -> None:
        """Upsert the watermark — called only AFTER the batch write succeeds
        (I5 ordering). Write-then-move keeps the advance atomic on POSIX and
        HDFS, mirroring the reference's single-row transactional UPDATE."""
        rows = self._rows()
        rows[(toolid.upper(), apname)] = {
            "toolid": toolid.upper(),
            "apname": apname,
            "last_end_time": wm,
            "enabled": "TRUE",
            "virtual_recipe": None,
            "update_time": datetime.now(),
        }
        self._fs.create_dir(self.path, recursive=True)
        table = pa.Table.from_pylist(list(rows.values()), schema=ARROW_SCHEMA)
        tmp = self._file + ".tmp"
        pq.write_table(table, tmp, filesystem=self._fs)
        self._fs.move(tmp, self._file)
