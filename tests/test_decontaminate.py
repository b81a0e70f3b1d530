"""Decontamination operator semantics on a hand-built corpus."""

from __future__ import annotations

from python_async_sample_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
)


def _corpus(spark):
    # eval doc: "a b c d e f" → 5-grams {"a b c d e", "b c d e f"}
    ev = spark.createDataFrame([(100, "a b c d e f")], "doc_id long, text string")
    train = spark.createDataFrame(
        [
            (1, "x a b c d e y z q w"),  # contains "a b c d e" → contaminated
            (2, "p q r s t u v w x y"),  # clean
            (3, "a b c d e f"),  # fully tainted (both eval 5-grams)
        ],
        "doc_id long, text string",
    )
    return train, ev


def test_contamination_report_counts(spark):
    train, ev = _corpus(spark)
    rows = {
        r["doc_id"]: r
        for r in contamination_report(train, ev, "doc_id", "text", n=5).collect()
    }
    assert set(rows) == {1, 3}  # doc 2 is clean → absent
    assert rows[1]["n_tainted"] == 1 and rows[1]["n_shingles"] == 6
    assert rows[3]["n_tainted"] == 2 and rows[3]["n_shingles"] == 2
    assert rows[3]["contamination"] == 1.0


def test_decontaminate_drops_on_any_hit(spark):
    train, ev = _corpus(spark)
    kept = sorted(
        r["doc_id"] for r in decontaminate(train, ev, "doc_id", "text", n=5).collect()
    )
    assert kept == [2]


def test_decontaminate_threshold(spark):
    train, ev = _corpus(spark)
    # doc 1 is 1/6 ≈ 0.167 tainted: a 0.2 ceiling keeps it, drops doc 3
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(
            train, ev, "doc_id", "text", n=5, max_contamination=0.2
        ).collect()
    )
    assert kept == [1, 2]
