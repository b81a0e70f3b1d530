"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its ANSI-SQL oracle on the same parquet
tables, then compares row count, column names, and order-insensitive values
(doubles to a small tolerance — both sides already round computed floats,
this guards against representation noise only).
"""

from __future__ import annotations

import math

import duckdb

from python_async_sample_spark.sources.readers import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result (order-insensitive)."""
    con = duckdb_connect(sf_dir)
    oracle_rows = con.execute(oracle_sql).fetchall()
    oracle_cols = [d[0] for d in con.description]
    con.close()

    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns

    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"column mismatch: spark={spark_cols} oracle={oracle_cols}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )

    # Align column order by sorted name (as the driver does), then compare
    # as order-insensitive multisets. Sort key stringifies cells so rows with
    # None / mixed types stay orderable.
    def _row_key(row):
        return tuple((v is None, str(v)) for v in row)

    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    o_idx = [oracle_cols.index(c) for c in sorted(oracle_cols)]
    s_set = sorted(
        (tuple(_norm_cell(r[i]) for i in s_idx) for r in spark_rows), key=_row_key
    )
    o_set = sorted(
        (tuple(_norm_cell(r[i]) for i in o_idx) for r in oracle_rows), key=_row_key
    )
    mismatches = [(a, b) for a, b in zip(s_set, o_set) if a != b]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows): first={mismatches[:3]}"
