"""Compaction and range clustering: content-preserving, layout-changing."""

from __future__ import annotations

import glob
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from python_async_sample_spark.sources.layout import cluster_by, compact, dir_bytes
from python_async_sample_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def fragmented(spark, sf_dir):
    """The events table shattered into 64 small files — the post-streaming
    sink shape compaction exists to fix."""
    tmp = tempfile.mkdtemp(prefix="layout_frag_") + "/events_64"
    load_table(spark, sf_dir, "events").repartition(64).write.parquet(tmp)
    return tmp


def _files(path: str) -> list[str]:
    return sorted(glob.glob(f"{path}/part-*.parquet"))


def test_compact_reduces_files_and_preserves_content(spark, fragmented):
    out = tempfile.mkdtemp(prefix="layout_out_") + "/compacted"
    before = spark.read.parquet(fragmented)
    compacted = compact(spark, fragmented, out, target_file_mb=128)

    assert len(_files(fragmented)) == 64
    # sf0.001 events ≪ 128 MB → exactly one output file
    assert len(_files(out)) == 1
    assert compacted.count() == before.count()
    assert before.exceptAll(compacted).count() == 0
    assert compacted.exceptAll(before).count() == 0


def test_target_count_derives_from_bytes(spark, fragmented):
    total = dir_bytes(spark, fragmented)
    assert total > 0
    out = tempfile.mkdtemp(prefix="layout_out_") + "/tiny_target"
    # a 1 MB target below the table size forces ceil(bytes/1MB) files
    compact(spark, fragmented, out, target_file_mb=1)
    assert len(_files(out)) == max(1, -(-total // (1024 * 1024)))


def test_cluster_by_gives_disjoint_file_ranges(spark, fragmented):
    out = tempfile.mkdtemp(prefix="layout_out_") + "/clustered"
    clustered = cluster_by(spark, fragmented, out, ["user_id"], n_files=4)
    files = _files(out)
    assert len(files) > 1

    # each file owns a disjoint user_id range → footer min/max prunes scans
    ranges = []
    for f in files:
        meta = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            col = next(
                meta.row_group(rg).column(i)
                for i in range(meta.num_columns)
                if meta.row_group(rg).column(i).path_in_schema == "user_id"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # range boundaries may touch, never interleave

    before = spark.read.parquet(fragmented)
    assert before.exceptAll(clustered).count() == 0
    assert clustered.exceptAll(before).count() == 0


def test_compact_never_overwrites(spark, fragmented):
    out = tempfile.mkdtemp(prefix="layout_out_") + "/once"
    compact(spark, fragmented, out, target_file_mb=128)
    with pytest.raises(Exception):
        compact(spark, fragmented, out, target_file_mb=128)


def test_delete_keys_rewrites_only_affected_files(spark, fragmented):
    from python_async_sample_spark.sources.layout import delete_keys

    out = tempfile.mkdtemp(prefix="layout_out_") + "/gdpr"
    cluster_by(spark, fragmented, out, ["user_id"], n_files=4)
    before_files = {f: pq.read_metadata(f).num_rows for f in _files(out)}
    before_count = spark.read.parquet(out).count()
    # pick two users from the FIRST file's range so other files stay put
    first = sorted(before_files)[0]
    lo_users = sorted(
        r["user_id"]
        for r in spark.read.parquet(first).select("user_id").distinct().collect()
    )[:2]
    n_target = (
        spark.read.parquet(out).where(F.col("user_id").isin(lo_users)).count()
    )
    assert n_target > 0

    stats = delete_keys(spark, out, "user_id", lo_users)
    assert stats["deleted_rows"] == n_target
    assert stats["rewritten"] >= 1
    assert stats["rewritten"] + stats["untouched"] == 4

    after = spark.read.parquet(out)
    assert after.where(F.col("user_id").isin(lo_users)).count() == 0
    assert after.count() == before_count - n_target
    # untouched files are byte-identical (same path, same row count)
    survivors = [f for f in _files(out) if f in before_files]
    assert len(survivors) == stats["untouched"]
    for f in survivors:
        assert pq.read_metadata(f).num_rows == before_files[f]
