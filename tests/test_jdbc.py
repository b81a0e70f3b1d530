"""Unit tests for the JDBC connector's pure parts (no database here)."""

from __future__ import annotations

from datetime import datetime

import pytest

from python_async_sample_spark.sources.jdbc import delete_window_sql, interval_predicates

LO = datetime(2024, 1, 1)
HI = datetime(2024, 1, 3)


def test_interval_predicates_partition_exactly():
    preds = interval_predicates("endtime", LO, HI, 4)
    assert len(preds) == 4
    # half-open chaining: each chunk's upper bound is the next one's lower
    assert "endtime > TIMESTAMP '2024-01-01 00:00:00.000000'" in preds[0]
    assert "endtime <= TIMESTAMP '2024-01-01 12:00:00.000000'" in preds[0]
    assert "endtime > TIMESTAMP '2024-01-01 12:00:00.000000'" in preds[1]
    assert "endtime <= TIMESTAMP '2024-01-03 00:00:00.000000'" in preds[-1]


def test_interval_predicates_empty_and_invalid():
    assert interval_predicates("ts", HI, LO, 4) == []
    assert interval_predicates("ts", LO, LO, 4) == []
    with pytest.raises(ValueError):
        interval_predicates("ts", LO, HI, 0)


def test_delete_window_sql_halfopen():
    sql = delete_window_sql("tlcd_rawdata", "tstamp", LO, HI)
    assert sql.startswith("DELETE FROM tlcd_rawdata")
    assert "tstamp > TIMESTAMP '2024-01-01 00:00:00.000000'" in sql
    assert "tstamp <= TIMESTAMP '2024-01-03 00:00:00.000000'" in sql
