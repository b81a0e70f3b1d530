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


def test_semantic_contamination_flags_planted_leak(spark):
    """q231's operator: a corpus vector aligned with an eval vector is
    flagged with THAT eval id (ties on the 1e-6 grid go to the lowest
    eval id); orthogonal corpus vectors pass clean; the eval cap and the
    empty-eval contract raise loudly."""
    import pytest

    from python_async_sample_spark.operators.decontaminate import (
        semantic_contamination,
    )

    d = 8
    def unit(i):  # standard basis vectors: exact cosines 0/1
        v = [0.0] * d
        v[i] = 1.0
        return v

    ev = spark.createDataFrame(
        [(100, unit(0)), (101, unit(1))], "vec_id bigint, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [
            (1, unit(0)),          # exact leak of eval 100 → cosine 1.0
            (2, unit(1)),          # exact leak of eval 101
            (3, unit(2)),          # orthogonal → clean
            (4, [0.8, 0.6] + [0.0] * (d - 2)),  # 0.8 to eval 100 → flagged
        ],
        "vec_id bigint, embedding array<double>",
    )
    got = {
        r["corpus_id"]: (r["matched_eval_id"], r["cosine"])
        for r in semantic_contamination(
            corpus, ev, "vec_id", "embedding", threshold=0.5
        ).collect()
    }
    assert got == {1: (100, 1.0), 2: (101, 1.0), 4: (100, 0.8)}

    with pytest.raises(ValueError, match="max_eval"):
        semantic_contamination(corpus, ev, "vec_id", "embedding", max_eval=1)
    empty = ev.where("vec_id < 0")
    with pytest.raises(ValueError, match="empty"):
        semantic_contamination(corpus, empty, "vec_id", "embedding")
