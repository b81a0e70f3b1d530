"""Dynamic per-tool wide-table materialization (§1.3): column sets are
data, schemas differ per tool, pivot fills NULL."""

from __future__ import annotations

from python_async_sample_spark.sources.wide import (
    materialize_wide_tables,
    params_per_tool,
    read_wide_table,
)


def _eav(spark):
    rows = [
        # tool A measures p1/p2 on two glasses; one (glass, param) missing
        ("TLCDA01", "g1", "p1", 1.0),
        ("TLCDA01", "g1", "p2", 2.0),
        ("TLCDA01", "g2", "p1", 3.0),
        # tool B measures a different param set entirely
        ("TLCDB01", "g9", "p2", 9.0),
        ("TLCDB01", "g9", "p3", 8.0),
    ]
    return spark.createDataFrame(
        rows, "toolid string, glassid string, param_name string, param_value double"
    )


def test_params_discovered_per_tool(spark):
    assert params_per_tool(_eav(spark)) == {
        "TLCDA01": ["p1", "p2"],
        "TLCDB01": ["p2", "p3"],
    }


def test_materialize_and_read_back(spark, tmpdir):
    paths = materialize_wide_tables(_eav(spark), str(tmpdir), grain_cols=["glassid"])
    assert set(paths) == {"TLCDA01", "TLCDB01"}

    a = read_wide_table(spark, str(tmpdir), "TLCDA01")
    assert a.columns == ["glassid", "p1", "p2"]
    got = {r.glassid: (r.p1, r.p2) for r in a.collect()}
    assert got == {"g1": (1.0, 2.0), "g2": (3.0, None)}  # NULL fill

    b = read_wide_table(spark, str(tmpdir), "TLCDB01")
    assert b.columns == ["glassid", "p2", "p3"]  # per-tool schema differs


def test_substring_position_collation():
    # O4: the reference orders ROT wide columns by the characters at
    # 1-indexed positions 10 then 8 (R/pg_db.R:45) so x/y pairs interleave.
    from python_async_sample_spark.sources.wide import collate_by_char_positions

    cols = [
        "tp_al__a_y_p2",  # pos10=y pos8=a
        "tp_al__b_x_p1",  # pos10=x pos8=b
        "tp_al__a_x_p1",  # pos10=x pos8=a
        "tp_al__b_y_p2",  # pos10=y pos8=b
        "short",          # no pos 8/10 → '' keys, sorts first
    ]
    assert collate_by_char_positions(cols) == [
        "short",
        "tp_al__a_x_p1",
        "tp_al__b_x_p1",
        "tp_al__a_y_p2",
        "tp_al__b_y_p2",
    ]
    # stability: ties (same chars at both positions) keep input order
    ties = ["tp_al__a_x_pZ", "tp_al__a_x_pA"]
    assert collate_by_char_positions(ties) == ties


def test_case_colliding_tool_ids_refused(spark):
    """Review fix: tool ids differing only in case would clobber each
    other's lowercase table path — must raise, not last-writer-wins."""
    import tempfile

    import pytest

    from python_async_sample_spark.sources.wide import materialize_wide_tables

    long_df = spark.createDataFrame(
        [("T1", "g", "p", 1.0), ("t1", "g", "p", 2.0)],
        "toolid string, glassid string, param string, value double",
    )
    with pytest.raises(ValueError, match="collide case-insensitively"):
        materialize_wide_tables(
            long_df, tempfile.mkdtemp(), ["glassid"], "toolid", "param", "value"
        )
