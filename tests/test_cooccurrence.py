"""Bounded-vocabulary co-occurrence PMI invariants."""

from __future__ import annotations

from python_async_sample_spark.operators.text import cooccurrence_pmi


def test_pairs_restricted_to_vocab_and_ordered(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c rare1"),
            (2, "a b c rare2"),
            (3, "a b c rare3"),
            (4, "a b rare4 rare5"),
            (5, "a b c x"),
        ],
        "doc_id long, text string",
    )
    out = cooccurrence_pmi(df, "doc_id", "text", vocab_size=3, min_pair_docs=2).collect()
    toks = {t for r in out for t in (r["tok_a"], r["tok_b"])}
    # vocab = 3 most document-frequent tokens: a(5), b(5), c(4)
    assert toks <= {"a", "b", "c"}
    assert all(r["tok_a"] < r["tok_b"] for r in out)
    ab = next(r for r in out if (r["tok_a"], r["tok_b"]) == ("a", "b"))
    assert ab["n_docs_pair"] == 5
    # P(a,b)=1, P(a)=P(b)=1 -> PMI ln(1)=0
    assert abs(ab["pmi"]) < 1e-9


def test_min_pair_docs_filters(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "b c")],
        "doc_id long, text string",
    )
    out = cooccurrence_pmi(df, "doc_id", "text", vocab_size=10, min_pair_docs=2).collect()
    assert {(r["tok_a"], r["tok_b"]) for r in out} == {("a", "b")}
