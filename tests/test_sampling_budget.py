"""Token-budget sampling determinism and budget adherence."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_async_sample_spark.operators.sampling import token_budget_take
from python_async_sample_spark.sources.readers import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )


def test_budget_is_inclusive_and_never_exceeded(spark, sf_dir):
    out = token_budget_take(_docs(spark, sf_dir), "source", "doc_id", "n_tokens", 600)
    per_source = (
        out.groupBy("source").agg(F.max("cum_tokens").alias("m")).collect()
    )
    assert per_source and all(r["m"] <= 600 for r in per_source)


def test_selection_is_partitioning_invariant(spark, sf_dir):
    base = _docs(spark, sf_dir)
    a = {
        r["doc_id"]
        for r in token_budget_take(base, "source", "doc_id", "n_tokens", 600).collect()
    }
    b = {
        r["doc_id"]
        for r in token_budget_take(
            base.repartition(13), "source", "doc_id", "n_tokens", 600
        ).collect()
    }
    assert a == b and a


def test_greedy_prefix_property(spark):
    # within one group, the kept set is a PREFIX of the hash order: no row
    # is skipped and a later row kept
    df = spark.createDataFrame(
        [(i, "g", 10) for i in range(20)], "doc_id long, source string, n_tokens long"
    )
    out = token_budget_take(df, "source", "doc_id", "n_tokens", 95)
    rows = out.collect()
    assert len(rows) == 9  # 9 * 10 = 90 <= 95 < 100
    assert max(r["cum_tokens"] for r in rows) == 90
