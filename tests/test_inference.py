"""Batch-inference harness: load-once-per-worker and schema stability."""

from __future__ import annotations

import glob
import os
import tempfile
import uuid

from python_async_sample_spark.operators.inference import LinearTextModel, batch_score


def test_loader_runs_once_per_worker_not_per_batch(spark, sf_dir):
    """Force many small Arrow batches over few partitions: the model must
    load at most once per task/worker, not once per batch."""
    from python_async_sample_spark.sources.readers import load_table

    marker_dir = tempfile.mkdtemp(prefix="loads_")

    def counting_loader():
        with open(os.path.join(marker_dir, uuid.uuid4().hex), "w") as f:
            f.write("x")
        return LinearTextModel()

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").repartition(2)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "25")
    try:
        out = batch_score(docs, "text", loader=counting_loader)
        n = out.count()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert n == 500
    loads = len(glob.glob(f"{marker_dir}/*"))
    # 500 rows / 25-per-batch = ~20 batches; loads must track partitions
    assert 1 <= loads <= 2, loads


def test_input_schema_not_mutated_and_scores_match_expression_form(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x x x x x x x x")], "doc_id long, text string"
    )
    before = [f.name for f in df.schema.fields]
    out = batch_score(df, "text")
    after = [f.name for f in df.schema.fields]
    assert before == after == ["doc_id", "text"]  # no schema-object mutation
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    toks = F.split("text", " ")
    z = (
        F.lit(-2.0)
        + F.lit(0.015) * F.least(F.size(toks), F.lit(400))
        + F.lit(3.0) * (F.size(F.array_distinct(toks)) / F.size(toks))
        - F.lit(0.002) * (F.length("text") / F.size(toks))
    )
    want = {
        r["doc_id"]: r["p"]
        for r in df.select("doc_id", (1 / (1 + F.exp(-z))).alias("p")).collect()
    }
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_linear_model_scores_null_text_without_crashing():
    """Review fix: a NULL text row must degrade to an empty-string score,
    never an AttributeError that fails the Arrow task."""
    from python_async_sample_spark.operators.inference import LinearTextModel

    m = LinearTextModel()
    scores = m.predict(["hello world", None, ""])
    assert len(scores) == 3
    assert all(s == s for s in scores)  # no NaN
    assert scores[1] == scores[2]  # None behaves as empty string
