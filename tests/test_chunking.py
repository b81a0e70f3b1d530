"""Document chunking: coverage, overlap, reconstruction properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_async_sample_spark.operators.chunking import chunk_documents


def test_chunks_cover_and_reconstruct(spark):
    words = [f"w{i}" for i in range(150)]
    df = spark.createDataFrame([(1, " ".join(words)), (2, "a b c"), (3, "solo")],
                               "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=64, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)

    # doc 1: 150 tokens, step 56 → starts 1, 57, 113 → 3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_no)
    assert [r.chunk_no for r in c1] == [0, 1, 2]
    assert [r.n_chunk_tokens for r in c1] == [64, 64, 150 - 113 + 1]
    # consecutive chunks share exactly the 8 overlap tokens
    first, second = c1[0].chunk.split(" "), c1[1].chunk.split(" ")
    assert first[-8:] == second[:8]
    # dropping each successor's overlap prefix reconstructs the document
    rebuilt = c1[0].chunk.split(" ")
    for r in c1[1:]:
        rebuilt += r.chunk.split(" ")[8:]
    assert rebuilt == words

    # short docs yield exactly one chunk, unpadded
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk == "a b c"
    assert by_doc[2][0].n_chunk_tokens == 3
    assert len(by_doc[3]) == 1 and by_doc[3][0].chunk == "solo"


def test_chunking_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", chunk_tokens=8, overlap=8)
