"""Repeated n-gram span semantics on hand-built corpora."""

from __future__ import annotations

from python_async_sample_spark.operators.substring_dedup import (
    positional_shingles,
    repeated_span_report,
)


def test_positional_shingles_positions_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b")], "doc_id long, text string"
    )
    rows = {
        (r["doc"], r["pos"]): r["gram"]
        for r in positional_shingles(df, "doc_id", "text", 3).collect()
    }
    # doc 2 is shorter than n -> no grams at all
    assert rows == {(1, 0): "a b c", (1, 1): "b c d"}


def test_repeated_span_counts_and_run_length(spark):
    # docs 1 and 2 share the 3-word span "x y z" embedded in different
    # contexts; doc 3 is clean. With n=2, the shared span marks positions
    # covering "x y" and "y z" in both docs -> run of 2 consecutive marked
    # positions.
    df = spark.createDataFrame(
        [
            (1, "p q x y z r s"),
            (2, "t x y z u v w"),
            (3, "a b c d e f g"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc"]: r for r in repeated_span_report(df, "doc_id", "text", n=2).collect()}
    assert out[1]["n_grams"] == 6 and out[2]["n_grams"] == 6
    assert out[1]["n_dup_grams"] == 2 and out[2]["n_dup_grams"] == 2
    assert out[1]["max_dup_run"] == 2 and out[2]["max_dup_run"] == 2
    assert out[3]["n_dup_grams"] == 0 and out[3]["max_dup_run"] == 0
    assert abs(out[1]["dup_ratio"] - round(2 / 6, 4)) < 1e-9


def test_within_doc_repetition_alone_is_not_cross_doc_dup(spark):
    # "x y" occurs twice inside doc 1 but nowhere else -> not duplicated
    df = spark.createDataFrame(
        [(1, "x y m x y"), (2, "c d e f g")], "doc_id long, text string"
    )
    out = {r["doc"]: r for r in repeated_span_report(df, "doc_id", "text", n=2).collect()}
    assert out[1]["n_dup_grams"] == 0


def test_both_positions_marked_when_repeated_gram_is_cross_doc(spark):
    # "x y" occurs twice in doc 1 AND once in doc 2 -> both doc-1 slots marked
    df = spark.createDataFrame(
        [(1, "x y m x y"), (2, "x y f g h")], "doc_id long, text string"
    )
    out = {r["doc"]: r for r in repeated_span_report(df, "doc_id", "text", n=2).collect()}
    assert out[1]["n_dup_grams"] == 2
    # positions 0 and 3 are not consecutive -> max run stays 1
    assert out[1]["max_dup_run"] == 1
