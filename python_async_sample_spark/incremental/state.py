"""Watermark state store — the reference's ``lastendtime`` table (I1/I5).

Reference: per-(toolid, apname) high-water mark read at ``dbs/nikon.py:19-37``
and advanced only after a successful batch at ``dbs/nikon.py:169-186`` /
``nikon_ETL.py:327-336`` (write-watermark-last ordering).

The store is a tiny parquet-backed table maintained from the driver. At
cluster scale this would be a transactional table (Delta/JDBC); the access
pattern (one row per pipeline, read at start, written at end) is identical.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("toolid", T.StringType(), False),
        T.StructField("apname", T.StringType(), False),
        T.StructField("last_end_time", T.TimestampType(), True),
        T.StructField("enabled", T.StringType(), True),  # 'TRUE'/'FALSE' strings, like the reference
        T.StructField("virtual_recipe", T.StringType(), True),
        T.StructField("update_time", T.TimestampType(), True),
    ]
)


class WatermarkStore:
    """The table is one row per pipeline, never data-sized, so the store
    keeps a driver-side write-through cache: reads hit parquet once, each
    upsert is a single overwrite job (the reference pays one UPDATE per
    advance, ``dbs/nikon.py:169-186``)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._cache: dict[tuple[str, str], Row] | None = None

    def _rows(self) -> dict[tuple[str, str], Row]:
        if self._cache is None:
            if os.path.exists(self.path):
                loaded = self.spark.read.schema(STATE_SCHEMA).parquet(self.path).collect()
            else:
                loaded = []
            self._cache = {(r.toolid, r.apname): r for r in loaded}
        return self._cache

    def get(self, toolid: str, apname: str) -> datetime | None:
        """Read one pipeline's watermark (reference: ``get_lastendtime``,
        enabled-gated, ``dbs/nikon.py:26-29``)."""
        row = self._rows().get((toolid.upper(), apname))
        if row is None or row.enabled != "TRUE":
            return None
        return row.last_end_time

    def put(self, toolid: str, apname: str, wm: datetime) -> None:
        """Upsert the watermark — called only AFTER the batch write succeeds
        (I5 ordering)."""
        rows = self._rows()
        rows[(toolid.upper(), apname)] = Row(
            toolid=toolid.upper(),
            apname=apname,
            last_end_time=wm,
            enabled="TRUE",
            virtual_recipe=None,
            update_time=datetime.now(),
        )
        self.spark.createDataFrame(list(rows.values()), STATE_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(self.path)
