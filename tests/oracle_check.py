"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its ANSI-SQL oracle on the same parquet
tables, then compares row count, column names, and order-insensitive values
(doubles to a small tolerance — both sides already round computed floats,
this guards against representation noise only).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

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


def _assert_driver_portable_schema(spark_df) -> None:
    """Reject array/map/struct result columns up front.

    The driver's canonicalizer pandas-sorts result rows over ALL columns;
    complex-typed cells are unhashable/unorderable there and error at the
    gate even when the values are right (round-8 q98 postmortem). This is
    an oracle-portability rule exactly like the rounding/TZ rules: a gate
    query must return only scalar columns — flatten collections with
    array_join/to_json before returning.
    """
    from pyspark.sql import types as T

    complex_cols = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"driver-unportable result schema: columns {complex_cols} are "
        "array/map/struct typed — the driver's pandas canonicalizer cannot "
        "sort them; return array_join(...)/to_json(...) strings instead"
    )


def _sort_cell(v):
    """Pre-sort normalizer: round floats (so representation noise cannot
    order two rounding-identical rows differently per engine) but KEEP
    NaN as float NaN — pandas sorts NA natively (na_position last), while
    the "NaN" string sentinel would make a mixed str/float column that
    sort_values refuses. The string sentinel is applied at extraction
    time only, where NaN != NaN would break the equality compare."""
    if isinstance(v, float):
        if math.isnan(v):
            return v
        return round(v, 6)
    return v


def _driver_canon(cols, rows) -> pd.DataFrame:
    """The driver's canonicalization shape: a pandas frame with columns
    sorted by name, rows sorted by ``sort_values`` over every column.
    Anything this throws on (e.g. unhashable list cells) fails at the real
    gate too — do NOT soften it with stringified sort keys.

    Scope note: cells are rounded (1e-6) before the sort, while the real
    gate sorts raw values. A query emitting UNROUNDED computed floats
    could therefore pair rows differently at the gate — but such a query
    already fails the gate's raw value-hash compare outright, ordering
    aside; the round-every-computed-double oracle rule is what guards
    that class. This pass proves sortability (no complex types, no mixed
    dtypes) and rounded-order stability."""
    order = sorted(cols)
    norm_rows = [tuple(_sort_cell(v) for v in r) for r in rows]
    df = pd.DataFrame(norm_rows, columns=list(cols))[order]
    df = df.sort_values(by=order, kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result (order-insensitive)."""
    _assert_driver_portable_schema(spark_df)
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

    # Driver-shaped canonicalization pass: replay the driver's own pandas
    # sort_values canon on both sides. The multiset compare above localizes
    # value diffs; THIS pass is what proves the result survives the gate's
    # exact code path (q98 was green on the multiset and red at the gate).
    s_canon = _driver_canon(spark_cols, spark_rows)
    o_canon = _driver_canon(oracle_cols, oracle_rows)
    # normalize AGAIN at extraction: pandas converts None to NaN inside
    # float columns, and raw NaN compares unequal to itself — _norm_cell
    # maps it to the comparable "NaN" sentinel (rounding is idempotent)
    s_vals = [
        tuple(_norm_cell(v) for v in r)
        for r in s_canon.itertuples(index=False, name=None)
    ]
    o_vals = [
        tuple(_norm_cell(v) for v in r)
        for r in o_canon.itertuples(index=False, name=None)
    ]
    assert s_vals == o_vals, (
        "driver-canon mismatch after multiset match — row ordering under "
        "pandas sort_values diverges between the two sides"
    )
