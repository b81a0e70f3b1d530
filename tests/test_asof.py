"""As-of join semantics: latest-at-or-before match, NULL when none,
equal-timestamp inclusion."""

from __future__ import annotations

from datetime import datetime

from python_async_sample_spark.operators.asof import asof_join


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u", ts("2024-01-01 10:00:00")),  # before any right row → NULL
            (2, "u", ts("2024-01-01 12:00:00")),  # exactly at a right ts → match it
            (3, "u", ts("2024-01-01 15:00:00")),  # between rows → earlier one
            (4, "v", ts("2024-01-01 12:00:00")),  # other key, no right rows → NULL
        ],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", ts("2024-01-01 12:00:00"), 1.0),
            ("u", ts("2024-01-01 14:00:00"), 2.0),
            ("u", ts("2024-01-01 16:00:00"), 3.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = asof_join(left, right, ["k"], "ts", "ts", payload_cols=["v"])
    got = {r.id: r.asof_v for r in out.collect()}
    assert got == {1: None, 2: 1.0, 3: 2.0, 4: None}
    # left row set and columns preserved
    assert sorted(out.columns) == sorted(["id", "k", "ts", "asof_v"])
    assert out.count() == 4


def test_asof_duplicate_right_ts_deterministic(spark):
    # several right rows at the same (key, ts): the carried payload is pinned
    # (max by payload order), invariant to input partitioning
    t = datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([("u1", t)], ["user_id", "ts"])
    right = spark.createDataFrame(
        [("u1", t, "a"), ("u1", t, "c"), ("u1", t, "b")],
        ["user_id", "ts", "payload"],
    )
    out = lambda r: asof_join(  # noqa: E731
        left, r, ["user_id"], "ts", "ts", ["payload"]
    ).collect()[0]["asof_payload"]
    assert out(right) == "c"
    assert out(right.repartition(7)) == "c"
    assert out(right.orderBy("payload")) == "c"
