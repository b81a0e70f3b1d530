"""Sweep-line peak concurrency semantics on hand-built intervals."""

from __future__ import annotations

from python_async_sample_spark.operators.sweepline import peak_concurrency


def _df(spark, rows):
    return spark.createDataFrame(rows, "s string, e string").selectExpr(
        "cast(s as timestamp) s", "cast(e as timestamp) e"
    )


def test_touching_intervals_do_not_overlap(spark):
    # [0,1) and [1,2): half-open — peak must be 1
    df = _df(
        spark,
        [
            ("2024-01-01 00:00:00", "2024-01-01 01:00:00"),
            ("2024-01-01 01:00:00", "2024-01-01 02:00:00"),
        ],
    )
    out = peak_concurrency(df, "s", "e").collect()
    assert len(out) == 1 and out[0]["peak"] == 1


def test_nested_and_crossing_intervals(spark):
    df = _df(
        spark,
        [
            ("2024-01-01 00:00:00", "2024-01-01 04:00:00"),
            ("2024-01-01 01:00:00", "2024-01-01 02:00:00"),
            ("2024-01-01 01:30:00", "2024-01-01 03:00:00"),
        ],
    )
    out = peak_concurrency(df, "s", "e").collect()
    assert out[0]["peak"] == 3  # 01:30–02:00 all three open


def test_carry_across_buckets(spark):
    # 10 intervals spanning midnight: day 2's peak includes the carried 10
    rows = [("2024-01-01 23:00:00", "2024-01-02 01:00:00")] * 10 + [
        ("2024-01-02 00:30:00", "2024-01-02 00:45:00")
    ]
    df = _df(spark, rows)
    out = {str(r["bucket"])[:10]: r["peak"] for r in peak_concurrency(df, "s", "e").collect()}
    assert out["2024-01-01"] == 10
    assert out["2024-01-02"] == 11  # carry 10 + the new one


def test_checksum_is_order_insensitive_and_additive(spark):
    from python_async_sample_spark.operators.cdc import table_checksum

    df = spark.createDataFrame(
        [("a", "x1"), ("a", "x2"), ("b", "y1"), ("a", None)],
        "g string, c string",
    )
    base = {r["g"]: (r["n_rows"], r["checksum"]) for r in table_checksum(df, ["g"], ["c"]).collect()}
    shuffled = {
        r["g"]: (r["n_rows"], r["checksum"])
        for r in table_checksum(df.repartition(7).orderBy("c"), ["g"], ["c"]).collect()
    }
    assert base == shuffled
    # additive across disjoint splits
    p1 = table_checksum(df.where("c = 'x1'"), ["g"], ["c"]).collect()[0]
    p2 = table_checksum(df.where("c is null or c = 'x2'"), ["g"], ["c"]).collect()[0]
    assert p1["checksum"] + p2["checksum"] == base["a"][1]
    # sensitive to content
    df2 = spark.createDataFrame(
        [("a", "x1"), ("a", "x2"), ("b", "y1"), ("a", "DIFFERENT")],
        "g string, c string",
    )
    got2 = {r["g"]: r["checksum"] for r in table_checksum(df2, ["g"], ["c"]).collect()}
    assert got2["a"] != base["a"][1]
