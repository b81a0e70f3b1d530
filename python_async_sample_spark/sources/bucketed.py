"""Bucketed tables — pre-shuffled storage for co-located joins.

At 100 TB the single biggest join cost is shuffling both fact tables on the
join key every query. Bucketing pays that shuffle ONCE at write time:
``bucketBy(n, key)`` hash-partitions files on disk, and a sort-merge join of
two tables bucketed on the join key with the same bucket count reads each
bucket pair directly — the physical plan has NO Exchange on either side
(asserted in tests/test_plan_quality.py). This is the Spark-native analog of
the reference keeping its per-tool tables pre-organized by key.

``ensure_bucketed`` is idempotent per (warehouse, name): the write happens
on first use, later calls just read the catalog table — so gate/bench
queries measure the join, not table preparation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_async_sample_spark.sources import hadoop_fs


def ensure_bucketed(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
) -> DataFrame:
    """Materialize ``df`` as a bucketed+sorted catalog table once; return it."""
    if not spark.catalog.tableExists(name):
        # A fresh (in-memory-catalog) session may find the previous session's
        # table directory without its catalog entry; clear the orphan so the
        # managed-table create doesn't refuse the location.
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        hadoop_fs.delete(spark, f"{warehouse.rstrip('/')}/{name}")
        (
            df.write.bucketBy(num_buckets, *bucket_cols)
            .sortBy(*bucket_cols)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    return spark.table(name)
