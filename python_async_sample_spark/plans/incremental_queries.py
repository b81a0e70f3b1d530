"""Incremental-subsystem queries (SURVEY §2.9) for the driver gate.

q17 runs the REAL pipeline — watermark store, chunked catch-up, idempotent
overwrite-window sink, deliberate late re-delivery — into a temp dir, then
returns the sink contents. The oracle is the plain interval SQL the whole
machinery must be equivalent to: that equivalence (including the re-delivery
being a no-op) is exactly the reference's exactly-once-per-window contract.
"""

from __future__ import annotations

import tempfile
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_async_sample_spark.incremental import (
    IncrementalRunner,
    IncrementalStage,
    WatermarkStore,
    read_target,
)
from python_async_sample_spark.plans.registry import query
from python_async_sample_spark.sources.readers import load_table

WM0 = datetime.fromisoformat("2024-01-24 00:00:00")


@query(
    "q17_incremental_catchup",
    oracle="""
    SELECT event_id, user_id, event_type, value,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS dt
    FROM events
    WHERE date_trunc('microseconds', ts) > TIMESTAMP '2024-01-24 00:00:00'
    ORDER BY event_id
    """,
    ref="I1,I2,I3,I4,I5,I6,S11,S12",
    tags=("incremental",),
)
def q17_incremental_catchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tmp = tempfile.mkdtemp(prefix="spark_graft_incr_")
    store = WatermarkStore(spark, f"{tmp}/state")
    runner = IncrementalRunner(spark, store)
    stage = IncrementalStage(
        name="EDC_Import",
        source=lambda s: load_table(s, sf_dir, "events"),
        target_path=f"{tmp}/edc",
        ts_col="ts",
    )
    store.put("NIKON", "EDC_Import", WM0)
    runner.run(stage)

    # Deliberate late re-delivery of the last 2 days: the sink must absorb it
    # without duplicates (delete-then-insert semantics, dbs/nikon.py:117-145).
    hi = store.get("NIKON", "EDC_Import")
    store.put("NIKON", "EDC_Import", datetime.fromisoformat("2024-01-28 00:00:00"))
    runner.run(stage)
    assert store.get("NIKON", "EDC_Import") == hi

    return (
        read_target(spark, f"{tmp}/edc")
        .withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .select("event_id", "user_id", "event_type", "value", "dt")
        .orderBy("event_id")
    )
