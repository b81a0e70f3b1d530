"""Observation metrics: quality counters without a second scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_async_sample_spark.operators.validate import observed
from python_async_sample_spark.sources.readers import load_table


def test_metrics_collected_during_the_one_action(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    df, obs = observed(
        docs,
        "docs_quality",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_text": F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)),
            "max_chars": F.max("n_chars"),
        },
    )
    out_rows = df.where(F.col("lang") == "en").count()  # the ONE action
    m = obs.get
    assert m["n_rows"] == docs.count()
    assert m["n_null_text"] == 0
    assert m["max_chars"] >= 1
    assert out_rows <= m["n_rows"]


def test_metrics_observe_pre_filter_rows(spark):
    # the observation sits where it is attached in the plan: before the
    # downstream filter, so it sees ALL rows — the property that makes it a
    # reject-rate counter
    df = spark.createDataFrame([(1,), (2,), (None,)], "v int")
    dfo, obs = observed(
        df, "pre_filter", {"n": F.count(F.lit(1)), "nulls": F.sum(F.col("v").isNull().cast("int"))}
    )
    kept = dfo.where(F.col("v").isNotNull()).count()
    assert kept == 2
    assert obs.get["n"] == 3 and obs.get["nulls"] == 1
