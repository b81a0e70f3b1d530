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
