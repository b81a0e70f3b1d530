"""Mergeable partials: merge equals direct, and incremental appends work."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_async_sample_spark.operators.partial_agg import build_partials, merge_partials

SPECS = [
    ("v", "sum", "s"),
    ("v", "count", "n"),
    ("v", "min", "mn"),
    ("v", "max", "mx"),
]


def _rows(df):
    return {
        tuple(r[k] for k in ("k",)): (r["s"], r["n"], r["mn"], r["mx"])
        for r in df.collect()
    }


def test_merge_equals_direct(spark):
    df = spark.createDataFrame(
        [(k, d, float(k * 10 + d + i)) for k in (1, 2) for d in (1, 2, 3) for i in range(4)],
        "k long, d long, v double",
    )
    partials = build_partials(df, ["k", "d"], SPECS)
    merged = merge_partials(partials, ["k"], SPECS)
    direct = build_partials(df, ["k"], SPECS)
    assert _rows(merged) == _rows(direct)


def test_incremental_append_then_merge(spark):
    """The operational shape: yesterday's partials persist; today's batch
    adds partial rows; the merge over the unioned partial table equals the
    direct aggregate over all raw data — no rescan of yesterday's facts."""
    old = spark.createDataFrame(
        [(1, 1, 5.0), (1, 1, 7.0), (2, 1, 1.0)], "k long, d long, v double"
    )
    new = spark.createDataFrame(
        [(1, 2, 100.0), (2, 2, -3.0), (3, 2, 9.0)], "k long, d long, v double"
    )
    partial_table = build_partials(old, ["k", "d"], SPECS).unionByName(
        build_partials(new, ["k", "d"], SPECS)
    )
    merged = merge_partials(partial_table, ["k"], SPECS)
    direct = build_partials(old.unionByName(new), ["k"], SPECS)
    assert _rows(merged) == _rows(direct)
