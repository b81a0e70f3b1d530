"""Streaming incremental-MV maintenance: versioned snapshots + merge."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from python_async_sample_spark.streaming.jobs import (
    _latest_mv_version,
    stream_incremental_mv_to_parquet,
)


def test_mv_merges_across_multiple_batches_and_matches_batch_agg(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="mv_test_")
    out = stream_incremental_mv_to_parquet(spark, sf_dir, tmp, n_source_files=4)
    versions = sorted(glob.glob(f"{tmp}/mv/v*"))
    assert len(versions) >= 2, versions  # the view was merged incrementally
    batch = (
        spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    got = {
        (r["user_id"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in out.collect()
    }
    want = {
        (r["user_id"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in batch.collect()
    }
    assert got == want


def test_uncommitted_snapshot_is_invisible(tmp_path):
    root = str(tmp_path)
    os.makedirs(f"{root}/v00001")
    open(f"{root}/v00001/_SUCCESS", "w").close()
    os.makedirs(f"{root}/v00002")  # no _SUCCESS: a crash mid-write
    assert _latest_mv_version(root) == f"{root}/v00001"
    assert _latest_mv_version(str(tmp_path / "empty")) is None
