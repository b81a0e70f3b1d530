"""Catalog discovery gates (S4/S5/J4): the participating-pipeline set is
data read from the catalog, not configuration."""

from __future__ import annotations

from python_async_sample_spark.sources.schema import (
    discover_tables,
    table_columns,
    table_exists,
)


def test_catalog_discovery(spark):
    spark.range(1).createOrReplaceTempView("tlcd_a01_rawdata")
    spark.range(1).createOrReplaceTempView("tlcd_b01_rawdata")
    spark.range(1).createOrReplaceTempView("unrelated")
    # SQL-LIKE wildcards: '_' is exactly one char, '%' any run
    assert discover_tables(spark, "tlcd___1_rawdata") == [
        "tlcd_a01_rawdata",
        "tlcd_b01_rawdata",
    ]
    assert discover_tables(spark, "tlcd%") == ["tlcd_a01_rawdata", "tlcd_b01_rawdata"]
    assert table_exists(spark, "unrelated") and not table_exists(spark, "absent")
    assert table_columns(spark, "unrelated") == ["id"]
