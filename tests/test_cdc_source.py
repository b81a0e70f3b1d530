"""The versioned-table streaming CDC source (Spark 4 Python DataSource API):
replay exactness, checkpoint resume, vacuum fail-loud."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_async_sample_spark.sources.readers import load_table
from python_async_sample_spark.sources.versioned import (
    append_versioned,
    create_table,
    current_version,
    delete_keys_versioned,
    merge_into_versioned,
    read_version,
)
from python_async_sample_spark.streaming.cdc_source import VersionedCDCDataSource


def _drain(spark, root, checkpoint, out):
    """availableNow drain of the CDC stream into a parquet sink dir."""
    spark.dataSource.register(VersionedCDCDataSource)
    q = (
        spark.readStream.format("versioned_cdc").option("path", root).load()
        .writeStream.foreachBatch(
            lambda b, e: b.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_cdc_stream_replays_history_exactly(spark, sf_dir, tmp_path):
    """Draining the CDC stream from scratch and APPLYING the deltas
    (inserts ⊎ … ∖ deletes, as multisets) reproduces the head snapshot
    exactly; per-version slices match changes_between's net diff after
    the cancellation pass; a second drain from the checkpoint emits only
    the new commits."""
    root = str(tmp_path / "t")
    out = str(tmp_path / "cdc_out")
    ckpt = str(tmp_path / "ckpt")

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    create_table(spark, root, orders.limit(200), n_files=4,
                 layout_col="o_orderkey")                       # v0
    merge_into_versioned(
        spark, root,
        orders.limit(30).withColumn("o_orderstatus", F.lit("M")),
        "o_orderkey",
    )                                                           # v1
    append_versioned(
        spark, root,
        orders.limit(10).withColumn("o_orderkey", F.col("o_orderkey") + 7_000_000),
    )                                                           # v2

    _drain(spark, root, ckpt, out)
    cdc = spark.read.parquet(out)
    base_cols = ["o_orderkey", "o_orderstatus", "price"]
    assert set(cdc.columns) == {*base_cols, "_change_type", "_commit_version"}
    assert cdc.where(~F.col("_change_type").isin("insert", "delete")).count() == 0
    # v0 is pure insert (the initial content)
    assert cdc.where((F.col("_commit_version") == 0)
                     & (F.col("_change_type") == "delete")).count() == 0

    # replay property: inserts ∖ deletes (multiset) == head snapshot
    ins = cdc.where(F.col("_change_type") == "insert").select(*base_cols)
    dels = cdc.where(F.col("_change_type") == "delete").select(*base_cols)
    head = read_version(spark, root, current_version(root)).select(*base_cols)
    replayed = ins.exceptAll(dels)
    assert replayed.exceptAll(head).count() == 0
    assert head.exceptAll(replayed).count() == 0

    # per-version slice ≡ changes_between after the cancellation pass
    from python_async_sample_spark.sources.versioned import changes_between

    for v in (1, 2):
        sl = cdc.where(F.col("_commit_version") == v)
        net_ins = (sl.where(F.col("_change_type") == "insert").select(*base_cols)
                   .exceptAll(sl.where(F.col("_change_type") == "delete")
                              .select(*base_cols)))
        net_del = (sl.where(F.col("_change_type") == "delete").select(*base_cols)
                   .exceptAll(sl.where(F.col("_change_type") == "insert")
                              .select(*base_cols)))
        cb = changes_between(spark, root, v - 1, v)
        cb_ins = cb.where(F.col("change_type") == "insert").select(*base_cols)
        cb_del = cb.where(F.col("change_type") == "delete").select(*base_cols)
        assert net_ins.exceptAll(cb_ins).count() == 0
        assert cb_ins.exceptAll(net_ins).count() == 0
        assert net_del.exceptAll(cb_del).count() == 0
        assert cb_del.exceptAll(net_del).count() == 0, v

    # checkpoint resume: a new commit, a second drain — ONLY v3 arrives
    n_before = cdc.count()
    victims = [r[0] for r in orders.limit(5).select("o_orderkey").collect()]
    delete_keys_versioned(spark, root, "o_orderkey", victims)   # v3
    _drain(spark, root, ckpt, out)
    cdc2 = spark.read.parquet(out)
    fresh = cdc2.where(F.col("_commit_version") == 3)
    assert cdc2.count() > n_before
    assert cdc2.where(F.col("_commit_version") < 3).count() == n_before
    # the deletion's net effect removes exactly the victims
    f_del = (fresh.where(F.col("_change_type") == "delete").select(*base_cols)
             .exceptAll(fresh.where(F.col("_change_type") == "insert")
                        .select(*base_cols)))
    assert f_del.count() == len(victims)
    assert sorted(r[0] for r in f_del.select("o_orderkey").collect()) == sorted(victims)


def test_cdc_stream_vacuumed_file_fails_loud(spark, sf_dir, tmp_path):
    """A CDC stream that fell behind vacuum's retention window must FAIL,
    not silently skip the reclaimed file."""
    from python_async_sample_spark.sources.versioned import vacuum

    root = str(tmp_path / "t")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    create_table(spark, root, orders.limit(50), n_files=2)      # v0
    merge_into_versioned(
        spark, root,
        orders.limit(5).withColumn("o_orderstatus", F.lit("M")),
        "o_orderkey",
    )                                                           # v1: rewrites
    vacuum(root, keep_last=1, grace_seconds=0)  # reclaims v0-only files

    with pytest.raises(Exception, match="vacuumed|STREAM_FAILED|FileNotFound"):
        _drain(spark, root, str(tmp_path / "ck2"), str(tmp_path / "out2"))


def test_cdc_stream_null_fills_pre_evolution_files(spark, sf_dir, tmp_path):
    """Schema evolution mid-history: files written BEFORE add_column lack
    the physical column; the CDC source must null-fill them to the stream
    schema (pinned at stream start = head schema) instead of erroring,
    and post-evolution rows carry their real values."""
    root = str(tmp_path / "t")
    out = str(tmp_path / "out")

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    create_table(spark, root, orders.limit(40), n_files=2)      # v0: 2 cols
    from python_async_sample_spark.sources.versioned import add_column

    add_column(spark, root, "o_channel", "string")              # v1: meta-only
    batch = (
        orders.limit(6)
        .withColumn("o_orderkey", F.col("o_orderkey") + 5_000_000)
        .withColumn("o_channel", F.lit("web"))
    )
    append_versioned(spark, root, batch)                        # v2

    _drain(spark, root, str(tmp_path / "ck"), out)
    cdc = spark.read.parquet(out)
    assert "o_channel" in cdc.columns
    v0 = cdc.where(F.col("_commit_version") == 0)
    assert v0.count() == 40
    assert v0.where(F.col("o_channel").isNotNull()).count() == 0  # null-filled
    v2 = cdc.where(F.col("_commit_version") == 2)
    assert v2.count() == 6
    assert v2.where(F.col("o_channel") == "web").count() == 6
    # v1 was metadata-only: no file changed, no CDC rows
    assert cdc.where(F.col("_commit_version") == 1).count() == 0


def test_cdc_resume_retention_needs_committed_offset_manifest(spark, sf_dir, tmp_path):
    """Round-8 sharpening of the vacuum contract: ``partitions(start, end)``
    diffs each manifest against its PARENT, so a stream resuming from
    committed offset v needs manifest v retained as the delta base.
    vacuum(keep_last=2) after a drain at offset v1 (head v2) reclaims v0
    and the resume delivers exactly v2's delta; vacuum(keep_last=1) — one
    version too aggressive — must fail the resume loudly."""
    from python_async_sample_spark.sources.versioned import vacuum

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")

    def build(tag):
        root = str(tmp_path / tag)
        create_table(spark, root, orders.limit(50), n_files=2)           # v0
        merge_into_versioned(
            spark, root,
            orders.limit(5).withColumn("o_orderstatus", F.lit("M")),
            "o_orderkey",
        )                                                                # v1
        _drain(spark, root, f"{root}_ck", f"{root}_out")                 # offset=v1
        merge_into_versioned(
            spark, root,
            orders.limit(3).withColumn("o_orderstatus", F.lit("X")),
            "o_orderkey",
        )                                                                # v2
        return root

    ok = build("ok")
    vacuum(ok, keep_last=2, grace_seconds=0)                             # v0 gone
    _drain(spark, ok, f"{ok}_ck", f"{ok}_out")                           # resumes
    resumed = spark.read.parquet(f"{ok}_out")
    assert resumed.where(F.col("_commit_version") == 2).count() > 0

    bad = build("bad")
    vacuum(bad, keep_last=1, grace_seconds=0)                            # v1 gone too
    with pytest.raises(Exception, match="vacuumed|STREAM_FAILED|FileNotFound"):
        _drain(spark, bad, f"{bad}_ck", f"{bad}_out")
