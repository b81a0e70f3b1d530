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


def test_delete_keys_second_pass_scans_rewritten_files(spark, fragmented):
    """Keys living in a prior pass's rewritten output must still be
    deletable, and a second pass must never clobber the first pass's kept
    rows (the GDPR contract across repeated invocations)."""
    from python_async_sample_spark.sources.layout import delete_keys

    out = tempfile.mkdtemp(prefix="layout_out_") + "/gdpr_twice"
    cluster_by(spark, fragmented, out, ["user_id"], n_files=4)
    all_users = sorted(
        r["user_id"]
        for r in spark.read.parquet(out).select("user_id").distinct().collect()
    )
    first_batch, second_batch = all_users[:1], all_users[1:2]
    total = spark.read.parquet(out).count()
    n1 = spark.read.parquet(out).where(F.col("user_id").isin(first_batch)).count()
    n2 = spark.read.parquet(out).where(F.col("user_id").isin(second_batch)).count()
    assert n1 > 0 and n2 > 0

    s1 = delete_keys(spark, out, "user_id", first_batch)
    assert s1["deleted_rows"] == n1
    # second pass targets users whose rows now live in pass-1's rewritten
    # files (same clustered range) — they must be found and removed, and
    # pass-1's kept rows must survive
    s2 = delete_keys(spark, out, "user_id", second_batch)
    assert s2["deleted_rows"] == n2
    after = spark.read.parquet(out)
    assert after.where(F.col("user_id").isin(first_batch + second_batch)).count() == 0
    assert after.count() == total - n1 - n2


def test_delete_keys_tolerates_missing_footer_stats(spark):
    """Files whose writer omitted column statistics are conservatively
    treated as affected instead of crashing the job."""
    import pyarrow as pa

    from python_async_sample_spark.sources.layout import delete_keys

    out = tempfile.mkdtemp(prefix="layout_out_") + "/nostats"
    df = spark.createDataFrame(
        [(i, f"payload-{i}") for i in range(100)], "user_id bigint, body string"
    )
    df.write.parquet(out)
    # add one file written WITHOUT footer statistics
    tbl = pa.table({"user_id": pa.array([500, 501], pa.int64()),
                    "body": pa.array(["x", "y"])})
    pq.write_table(tbl, f"{out}/nostats-extra.parquet", write_statistics=False)

    stats = delete_keys(spark, out, "user_id", [500, 3])
    assert stats["deleted_rows"] == 2
    after = spark.read.parquet(out)
    assert after.where(F.col("user_id").isin([500, 3])).count() == 0
    assert after.count() == 100 + 2 - 2


def _file_ranges(path, col):
    out = {}
    for f in _files(path):
        meta = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            c = next(
                meta.row_group(rg).column(i)
                for i in range(meta.num_columns)
                if meta.row_group(rg).column(i).path_in_schema == col
            )
            mins.append(c.statistics.min)
            maxs.append(c.statistics.max)
        out[f] = (min(mins), max(maxs))
    return out


def test_zorder_prunes_box_queries_on_both_dims(spark, fragmented):
    """Z-ordering by (user_id, int(value)) must give files small min/max
    rectangles in BOTH dimensions, so a box predicate can prune files on
    either column — single-column clustering can only prune its lead
    column."""
    from pyspark.sql import functions as F

    from python_async_sample_spark.sources.layout import zorder_by

    zout = tempfile.mkdtemp(prefix="layout_out_") + "/zorder"
    # events value is double — quantize to ints for the curve
    tmp = tempfile.mkdtemp(prefix="layout_out_") + "/quantized"
    spark.read.parquet(fragmented).withColumn(
        "value_i", F.col("value").cast("int")
    ).write.parquet(tmp)
    z = zorder_by(spark, tmp, zout, "user_id", "value_i", n_files=8)

    before = spark.read.parquet(tmp)
    assert before.exceptAll(z).count() == 0 and z.exceptAll(before).count() == 0

    u_ranges = _file_ranges(zout, "user_id")
    v_ranges = _file_ranges(zout, "value_i")
    files = list(u_ranges)
    assert len(files) == 8

    # box: user_id <= 1 AND value_i <= 40
    def intersects(f):
        return u_ranges[f][0] <= 1 and v_ranges[f][0] <= 40

    surviving = [f for f in files if intersects(f)]
    assert len(surviving) < len(files)  # the box prunes files
    # and specifically the VALUE dimension prunes at least one file whose
    # user range still matches — impossible under user_id-only clustering
    assert any(u_ranges[f][0] <= 1 and v_ranges[f][0] > 40 for f in files)


def test_morton_covers_full_16bit_domain(spark):
    """The spread-bits chain must ride long arithmetic: on ints, inputs
    >= 0x8000 reach bit 30 and the final shift wraps negative in 32-bit
    math — half the documented domain."""
    from python_async_sample_spark.sources.layout import morton2

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (65535, 65535), (32768, 32768), (65535, 0)],
        "x int, y int",
    )
    got = {(r.x, r.y): r.z for r in df.withColumn("z", morton2(F.col("x"), F.col("y"))).collect()}
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(65535, 65535)] == 0xFFFFFFFF
    assert got[(32768, 32768)] == 0xC0000000
    assert got[(65535, 0)] == 0x55555555
    assert all(z >= 0 for z in got.values())


def test_delete_keys_on_zordered_table(spark, fragmented):
    """The layout verbs compose: a GDPR delete on a Z-ordered table prunes
    by footer stats exactly as on a range-clustered one — rewriting only
    the files whose user_id range can contain the targets."""
    from python_async_sample_spark.sources.layout import delete_keys, zorder_by

    tmp = tempfile.mkdtemp(prefix="layout_out_") + "/zq"
    spark.read.parquet(fragmented).withColumn(
        "value_i", F.col("value").cast("int")
    ).write.parquet(tmp)
    out = tempfile.mkdtemp(prefix="layout_out_") + "/zgdpr"
    zorder_by(spark, tmp, out, "user_id", "value_i", n_files=8)

    vals = sorted(
        r.value_i for r in spark.read.parquet(out).select("value_i").distinct().collect()
    )
    target = vals[:2]  # low-value keys live in the curve's low-z files
    before = spark.read.parquet(out).count()
    n_target = spark.read.parquet(out).where(F.col("value_i").isin(target)).count()
    stats = delete_keys(spark, out, "value_i", target)
    assert stats["deleted_rows"] == n_target
    # the curve clusters value_i ranges, so high-value files stay untouched
    assert stats["untouched"] >= 1
    after = spark.read.parquet(out)
    assert after.count() == before - n_target
    assert after.where(F.col("value_i").isin(target)).count() == 0


def test_hive_partition_pruning_reads_only_matching_dirs(spark, sf_dir, tmp_path):
    """A filter on the partition column must become a PartitionFilter (plan
    level) and the scan must touch only the matching day's files (file
    level) — the before-any-footer pruning lever for a day-partitioned
    100 TB table."""
    from python_async_sample_spark.sources.layout import write_hive_partitioned
    from python_async_sample_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    write_hive_partitioned(ev, path, ["day"])

    df = spark.read.parquet(path).where(F.col("day") == "2024-01-05")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-01-05" in plan, plan

    # file-level proof: the scanned files all live under the matching dir
    scanned = [
        r["file"]
        for r in df.select(F.input_file_name().alias("file")).distinct().collect()
    ]
    assert scanned and all("day=2024-01-05" in f for f in scanned)

    # correctness: pruned read equals a full-scan filter
    full = ev.where(F.col("day") == "2024-01-05").count()
    assert df.count() == full


def test_delete_keys_preserves_null_key_rows(spark, tmp_path):
    """Review fix: NULL-key rows in an affected file must survive deletion
    (~isin() is NULL for NULL keys — previously they were silently
    dropped and miscounted as deleted)."""
    from python_async_sample_spark.sources.layout import delete_keys

    path = str(tmp_path / "tbl")
    rows = [(i if i % 4 else None, f"r{i}") for i in range(40)]
    spark.createDataFrame(rows, "user_id long, payload string").coalesce(2).write.parquet(path)
    n_null = sum(1 for k, _ in rows if k is None)
    out = delete_keys(spark, path, "user_id", [5, 9])
    assert out["deleted_rows"] == 2
    left = spark.read.parquet(path)
    assert left.where(F.col("user_id").isNull()).count() == n_null
    assert left.count() == 40 - 2


def test_delete_keys_refuses_remote_uris(spark):
    from python_async_sample_spark.sources.layout import delete_keys
    import pytest

    with pytest.raises(ValueError, match="local paths only"):
        delete_keys(spark, "s3a://bucket/table", "user_id", [1])


@pytest.fixture()
def keyed_table(spark, sf_dir):
    """A fresh range-clustered copy of orders keyed by o_orderkey — the
    shape merge_into prunes well on (each file owns a key range)."""
    src = f"{sf_dir.rstrip('/')}/orders.parquet"
    tmp = tempfile.mkdtemp(prefix="merge_tgt_") + "/orders"
    cluster_by(spark, src, tmp, ["o_orderkey"], n_files=8)
    return tmp


def test_merge_into_updates_and_inserts(spark, sf_dir, keyed_table):
    from python_async_sample_spark.sources.layout import merge_into

    before = spark.read.parquet(keyed_table)
    n_before = before.count()
    some = [r["o_orderkey"] for r in before.select("o_orderkey").limit(5).collect()]
    max_key = before.agg(F.max("o_orderkey")).collect()[0][0]

    updates = (
        before.where(F.col("o_orderkey").isin(some))
        .withColumn("o_orderstatus", F.lit("M"))
        .unionByName(
            before.where(F.col("o_orderkey").isin(some[:2]))
            .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(max_key + 1))
            .withColumn("o_orderstatus", F.lit("N"))
        )
    )
    stats = merge_into(spark, keyed_table, updates, "o_orderkey")
    assert stats["upserted_rows"] == 7
    assert stats["replaced_rows"] == 5  # the 5 matched keys were replaced
    assert stats["rewritten"] >= 1 and stats["untouched"] >= 1  # file pruning

    after = spark.read.parquet(keyed_table)
    assert after.count() == n_before + 2
    assert after.where(F.col("o_orderkey").isin(some)).where(
        F.col("o_orderstatus") != "M"
    ).count() == 0
    assert after.where(F.col("o_orderstatus") == "N").count() == 2
    # key uniqueness preserved
    assert after.groupBy("o_orderkey").count().where("count > 1").count() == 0


def test_merge_into_is_idempotent_under_redelivery(spark, keyed_table):
    from python_async_sample_spark.sources.layout import merge_into

    before = spark.read.parquet(keyed_table)
    some = [r["o_orderkey"] for r in before.select("o_orderkey").limit(3).collect()]
    updates_lazy = before.where(F.col("o_orderkey").isin(some)).withColumn(
        "o_totalprice", F.lit(999.99)
    )
    # materialize: a CDC batch is durable content, not a lazy view over the
    # very files the merge rewrites
    updates = spark.createDataFrame(updates_lazy.collect(), updates_lazy.schema)
    merge_into(spark, keyed_table, updates, "o_orderkey")
    snapshot = sorted(
        tuple(r) for r in spark.read.parquet(keyed_table).collect()
    )
    merge_into(spark, keyed_table, updates, "o_orderkey")  # re-delivery
    again = sorted(tuple(r) for r in spark.read.parquet(keyed_table).collect())
    assert snapshot == again


def test_merge_into_rejects_duplicate_source_keys(spark, keyed_table):
    import re

    from python_async_sample_spark.sources.layout import merge_into

    before = spark.read.parquet(keyed_table)
    one = before.limit(1)
    dup = one.unionByName(one.withColumn("o_orderstatus", F.lit("X")))
    with pytest.raises(ValueError, match=re.escape("duplicate merge key")):
        merge_into(spark, keyed_table, dup, "o_orderkey")


def test_merge_into_rejects_null_keys(spark, keyed_table):
    from python_async_sample_spark.sources.layout import merge_into

    before = spark.read.parquet(keyed_table)
    nulled = before.limit(1).withColumn(
        "o_orderkey", F.lit(None).cast("long")
    )
    with pytest.raises(ValueError, match="NULL merge keys"):
        merge_into(spark, keyed_table, nulled, "o_orderkey")


def test_merge_into_rejects_schema_drift_and_remote_paths(spark, keyed_table):
    from python_async_sample_spark.sources.layout import merge_into

    before = spark.read.parquet(keyed_table)
    with pytest.raises(ValueError, match="schema"):
        merge_into(spark, keyed_table, before.drop("o_orderpriority"), "o_orderkey")
    with pytest.raises(ValueError, match="local paths only"):
        merge_into(spark, "s3://bucket/t", before, "o_orderkey")
