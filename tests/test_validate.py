"""Runtime argument validation — parity with the reference's @checktypes
(cktypes.py:5-93) as used on the query API (eda_query.py:163-165)."""

from __future__ import annotations

import pytest

from python_async_sample_spark.api.scatter_gather import KeyedQuery
from python_async_sample_spark.api.validate import checked


def test_checked_rejects_and_accepts():
    @checked
    def f(a: int, b: str, maybe: int | None = None, *rest: int, **kw: str) -> str:
        return b * a

    assert f(2, "xy") == "xyxy"
    assert f(2, "xy", None) == "xyxy"
    assert f(2, "xy", 3, 4, 5, extra="ok") == "xyxy"

    # same failure mode as the reference's doctest: test(10, 1) → error
    # naming the function, argument, expected and received types
    with pytest.raises(TypeError, match=r"wrong type of 'b' argument.*'int'"):
        f(10, 1)
    with pytest.raises(TypeError, match="'maybe'"):
        f(1, "x", "not-an-int")
    with pytest.raises(TypeError, match="'rest'"):
        f(1, "x", 2, "bad-vararg")
    with pytest.raises(TypeError, match="'kw:extra'"):
        f(1, "x", extra=42)


def test_checked_vets_defaults_at_decoration():
    with pytest.raises(TypeError, match="default"):

        @checked
        def bad(a: int = "oops"):
            return a


def test_keyed_query_validates_args(spark):
    df = spark.createDataFrame([(1, 2)], ["c_custkey", "l_orderkey"])
    api = KeyedQuery(history=df, result=df, key_col="c_custkey", link_cols=["l_orderkey"])
    # the reference's misuse shape: a raw python list where the API wants the
    # keys relation (eda_query.py glass_history(glass_id: list) analog)
    with pytest.raises(TypeError, match="glass_history.*'keys'"):
        api.glass_history([1, 2, 3])
    with pytest.raises(TypeError, match="glass_raw_data.*'summary'"):
        api.glass_raw_data(df, summary=42)
    assert api.glass_raw_data(df, summary=None).count() == 1
