"""Integration: the streaming face drains into the batch idempotent sink.

The reference's exactly-once contract is delete-then-insert on the sink
(I3/I6); the engine's streaming face must be able to ride the SAME sink:
``foreachBatch`` hands each micro-batch to ``overwrite_window``, and a
duplicated re-delivery of the source must leave the target identical to a
single clean pass — the window rewrite, not streaming state, carries the
idempotency."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from python_async_sample_spark.incremental.sink import overwrite_window, read_target
from python_async_sample_spark.sources.readers import load_table
from python_async_sample_spark.streaming.jobs import bounded_drain_conf, pin_reader_conf


def test_foreachbatch_overwrite_window_is_idempotent(spark, sf_dir):
    work = tempfile.mkdtemp(prefix="stream_sink_")
    src_dir = f"{work}/src"
    os.makedirs(src_dir)
    events_path = f"{sf_dir.rstrip('/')}/events.parquet"
    # at-least-once delivery: the same file arrives twice
    shutil.copy(events_path, f"{src_dir}/00_events.parquet")
    shutil.copy(events_path, f"{src_dir}/01_events_redelivered.parquet")

    pin_reader_conf(spark)
    schema = spark.read.parquet(src_dir).schema
    target = f"{work}/target"

    def sink_batch(batch_df, _epoch):
        rows = batch_df.select(
            F.date_format(F.min("ts"), "yyyy-MM-dd").alias("lo"),
            F.date_format(F.max("ts"), "yyyy-MM-dd").alias("hi"),
        ).collect()[0]
        if rows["lo"] is None:
            return
        lo = dt.datetime.fromisoformat(rows["lo"]) - dt.timedelta(microseconds=1)
        hi = dt.datetime.fromisoformat(rows["hi"]) + dt.timedelta(days=1) - dt.timedelta(
            microseconds=1
        )
        overwrite_window(batch_df, target, "ts", lo, hi)

    with bounded_drain_conf(spark):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")  # one batch per delivery
            .parquet(src_dir)
            .writeStream.foreachBatch(sink_batch)
            .option("checkpointLocation", f"{work}/checkpoint")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    got = read_target(spark, target).select(*load_table(spark, sf_dir, "events").columns)
    want = load_table(spark, sf_dir, "events")
    assert got.count() == want.count()
    assert want.exceptAll(got).count() == 0
    assert got.exceptAll(want).count() == 0
