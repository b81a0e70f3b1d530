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
