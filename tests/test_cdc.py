"""Snapshot-diff semantics on hand-built frames."""

from __future__ import annotations

from python_async_sample_spark.operators.cdc import snapshot_diff


def test_null_sentinel_never_collides(spark):
    # (null, "x") vs ("x", null) must classify as changed, not unchanged
    old = spark.createDataFrame([(1, None, "x")], "k long, a string, b string")
    new = spark.createDataFrame([(1, "x", None)], "k long, a string, b string")
    out = snapshot_diff(old, new, "k", ["a", "b"]).collect()
    assert len(out) == 1 and out[0]["change_type"] == "changed"


def test_unchanged_rows_filtered_by_default(spark):
    old = spark.createDataFrame([(1, "same"), (2, "old")], "k long, v string")
    new = spark.createDataFrame([(1, "same"), (3, "new")], "k long, v string")
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, "k").collect()}
    assert got == {2: "removed", 3: "added"}
    full = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, "k", include_unchanged=True).collect()
    }
    assert full[1] == "unchanged"


def test_apply_diff_reconstructs_new_snapshot(spark, sf_dir):
    from pyspark.sql import functions as F

    from python_async_sample_spark.operators.cdc import apply_diff, snapshot_diff
    from python_async_sample_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 31 != 0).select("doc_id", "lang", "text")
    new = (
        docs.where(F.col("doc_id") % 29 != 0)
        .select(
            "doc_id",
            "lang",
            F.when(F.col("doc_id") % 17 == 0, F.upper("text"))
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    diff = snapshot_diff(old, new, "doc_id", ["lang", "text"])
    rebuilt = apply_diff(old, new, diff, "doc_id")
    assert rebuilt.count() == new.count()
    assert new.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(new).count() == 0


def test_scd2_collapses_runs_and_bounds_intervals(spark):
    from python_async_sample_spark.operators.cdc import scd2_history

    ev = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 00:00:00", 10),
            (1, "a", "2024-01-01 01:00:00", 11),  # same state -> collapsed
            (1, "b", "2024-01-01 02:00:00", 12),
            (1, "a", "2024-01-01 03:00:00", 13),  # back to a -> NEW version
            (2, "x", "2024-01-01 00:30:00", 14),
        ],
        "user_id long, event_type string, ts string, event_id long",
    ).selectExpr("user_id", "event_type", "cast(ts as timestamp) ts", "event_id")
    out = scd2_history(ev, "user_id", "event_type", "ts", "event_id").collect()
    u1 = sorted([r for r in out if r["user_id"] == 1], key=lambda r: r["version"])
    assert [r["event_type"] for r in u1] == ["a", "b", "a"]
    assert [r["version"] for r in u1] == [1, 2, 3]
    # each interval's end is the next interval's start; last is open
    assert u1[0]["valid_to_us"] == u1[1]["valid_from_us"]
    assert u1[1]["valid_to_us"] == u1[2]["valid_from_us"]
    assert u1[2]["valid_to_us"] is None
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["valid_to_us"] is None


def test_scd2_tiebreak_orders_same_timestamp_events(spark):
    from python_async_sample_spark.operators.cdc import scd2_history

    ev = spark.createDataFrame(
        [
            (1, "b", "2024-01-01 00:00:00", 2),
            (1, "a", "2024-01-01 00:00:00", 1),  # same ts: event_id decides
        ],
        "user_id long, event_type string, ts string, event_id long",
    ).selectExpr("user_id", "event_type", "cast(ts as timestamp) ts", "event_id")
    out = sorted(
        scd2_history(ev, "user_id", "event_type", "ts", "event_id").collect(),
        key=lambda r: r["version"],
    )
    assert [r["event_type"] for r in out] == ["a", "b"]


def test_checksum_mod_ring_additive_merge(spark):
    """Review fix: the checksum lives in the mod-2^32 ring — splitting a
    table arbitrarily and merging the split checksums mod 2^32 must
    reproduce the whole-table checksum (the overflow-proof mergeability
    contract)."""
    from pyspark.sql import functions as F

    from python_async_sample_spark.operators.cdc import table_checksum

    df = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("g"), F.col("id").cast("string").alias("c")
    )
    whole = {r["g"]: r["checksum"] for r in table_checksum(df, ["g"], ["c"]).collect()}
    a = table_checksum(df.where("id % 2 = 0"), ["g"], ["c"])
    b = table_checksum(df.where("id % 2 = 1"), ["g"], ["c"])
    merged = {}
    for r in a.collect() + b.collect():
        merged[r["g"]] = (merged.get(r["g"], 0) + r["checksum"]) % 4294967296
    assert merged == whole
    for v in whole.values():
        assert 0 <= v < 4294967296
