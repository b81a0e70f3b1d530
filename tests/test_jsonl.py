"""JSON-lines source: schema-pinned scan and corrupt-record routing."""

from __future__ import annotations

import os
import tempfile

from python_async_sample_spark.sources.readers import read_jsonl


def test_corrupt_lines_are_routed_not_fatal(spark):
    tmp = tempfile.mkdtemp(prefix="jsonl_test_")
    path = os.path.join(tmp, "part-0.jsonl")
    with open(path, "w") as f:
        f.write('{"doc_id": 1, "text": "good row"}\n')
        f.write("{not json at all\n")
        f.write('{"doc_id": 3, "text": "another good row"}\n')

    df = read_jsonl(
        spark, tmp, schema="doc_id long, text string, _corrupt_record string"
    )
    rows = df.collect()
    assert len(rows) == 3
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["doc_id"] for r in good} == {1, 3}
    assert len(bad) == 1 and bad[0]["doc_id"] is None


def test_schema_evolution_merge_on_read(spark):
    """Newer files add a column; mergeSchema reads both generations with
    nulls backfilled — the append-only evolution a long-lived corpus needs."""
    import tempfile

    tmp = tempfile.mkdtemp(prefix="evolve_")
    spark.createDataFrame([(1, "a")], "doc_id long, text string").write.parquet(
        f"{tmp}/gen=1"
    )
    spark.createDataFrame(
        [(2, "b", "en")], "doc_id long, text string, lang string"
    ).write.parquet(f"{tmp}/gen=2")
    df = spark.read.option("mergeSchema", "true").parquet(tmp)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(df.columns) >= {"doc_id", "text", "lang"}
    assert rows[1]["lang"] is None and rows[2]["lang"] == "en"
