"""shingle_boilerplate_clean edge cases the corpus fixture can't reach:
fully-boilerplate docs, short docs, threshold exactness.  Groups hold 10
docs so a single-doc shingle (10%) sits below the 30% cut — with tiny
groups EVERY shingle clears the threshold, which is correct behavior for
the parameter but useless for these assertions."""

from __future__ import annotations

from python_async_sample_spark.operators.text import shingle_boilerplate_clean

TPL = "h1 h2 h3 h4 h5"


def _clean(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    out = shingle_boilerplate_clean(df, **kw)
    return {r["doc_id"]: r for r in out.collect()}


def _filler(i):
    return f"a{i} b{i} c{i} d{i} e{i} f{i} g{i} h{i} i{i} j{i}"


def test_fully_boilerplate_doc_yields_empty_not_missing(spark):
    rows = (
        [(0, "s", TPL)]                                 # the template, nothing else
        + [(i, "s", TPL + " " + _filler(i)) for i in range(1, 4)]
        + [(i, "s", _filler(i)) for i in range(4, 10)]  # no template at all
    )
    got = _clean(spark, rows, n=5, df_num=3, df_den=10)
    assert set(got) == set(range(10))   # no doc silently dropped
    assert got[0]["clean_text"] == "" and got[0]["n_removed"] == 5
    # bodies are fully distinct, so removal stops exactly at the template
    # boundary (a shared token right AFTER the template would extend the
    # boilerplate shingle across the boundary — by design)
    assert got[1]["clean_text"] == _filler(1)
    assert got[1]["n_removed"] == 5 and got[1]["n_tokens"] == 15
    assert got[5]["n_removed"] == 0 and got[5]["clean_text"] == _filler(5)


def test_short_docs_pass_through_untouched(spark):
    rows = [(i, "s", "x y") for i in range(10)]
    got = _clean(spark, rows, n=5)
    assert all(got[i]["n_removed"] == 0 and got[i]["clean_text"] == "x y" for i in got)


def test_threshold_is_exact_integer_arithmetic(spark):
    def corpus(n_with_tpl):
        return [
            (i, "s", (TPL + " " + _filler(i)) if i < n_with_tpl else _filler(i))
            for i in range(10)
        ]

    # exactly 3 of 10 docs → 3*10 >= 3*10 holds (>= is inclusive): removed
    got = _clean(spark, corpus(3), n=5, df_num=3, df_den=10)
    assert got[0]["n_removed"] == 5 and got[0]["clean_text"] == _filler(0)
    # exactly 2 of 10 → 2*10 < 3*10: untouched
    got2 = _clean(spark, corpus(2), n=5, df_num=3, df_den=10)
    assert got2[0]["n_removed"] == 0


def test_groups_are_independent(spark):
    rows_a = [(i, "a", TPL + " " + _filler(i)) for i in range(10)]
    rows_b = [(100 + i, "b", _filler(100 + i)) for i in range(9)] + [
        (109, "b", TPL + " " + _filler(109))
    ]
    got = _clean(spark, rows_a + rows_b, n=5, df_num=3, df_den=10)
    assert got[0]["n_removed"] == 5          # universal in a: removed there
    assert got[109]["n_removed"] == 0        # 1 of 10 in b: kept there
