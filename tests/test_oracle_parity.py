"""Every registered query with an oracle must match DuckDB on sf0.001 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from python_async_sample_spark.plans.registry import load_all
from tests.oracle_check import compare

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df is not None
    if spec.oracle is None:
        # rows-only check, like the driver's weak path
        assert df.count() >= 0
    else:
        compare(df, spec.oracle, sf_dir)


def test_complex_typed_gate_result_rejected(spark):
    """Oracle-portability rule (round-8 q98 postmortem): a gate query must
    return only scalar columns — the driver's pandas canonicalizer throws
    on array/map/struct cells. compare() must refuse such schemas up front
    so the divergence can never again be green locally and red at the gate."""
    from tests.oracle_check import _assert_driver_portable_schema

    bad = spark.createDataFrame(
        [(1, ["a", "b"])], "id: bigint, priorities: array<string>"
    )
    with pytest.raises(AssertionError, match="driver-unportable"):
        _assert_driver_portable_schema(bad)
    good = spark.createDataFrame([(1, "a,b")], "id: bigint, priorities: string")
    _assert_driver_portable_schema(good)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
    # contract alignment: every oracle key exists in queries()
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)


def test_rows_only_twin_bookkeeping():
    """Every no-oracle query declares an oracled certified twin and the
    exported metadata is self-consistent (VERDICT r9 item 5)."""
    import __spark_entry__ as e

    meta = e.query_metadata()
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(meta) == set(qs)
    rows_only = {n for n, m in meta.items() if m["rows_only"]}
    assert rows_only == set(qs) - set(os_)
    for n in rows_only:
        twin = meta[n]["certified_twin"]
        assert twin in os_, (n, twin)
    for n, m in meta.items():
        if not m["rows_only"]:
            assert m["certified_twin"] is None, n
