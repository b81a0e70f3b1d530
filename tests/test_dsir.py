"""DSIR hashed-ngram importance resampling (operators/dsir.py, q233).

The oracle certifies the full selection end-to-end (bucket hash, smoothed
log ratio, fixed-point scores) against DuckDB; these tests pin the local
semantics the hash-match cannot articulate: the score actually ranks
target-resembling candidates first, the pick is partitioning-invariant,
and the n-gram/bucket building blocks hold their contracts on edges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_async_sample_spark.operators.dsir import (
    dsir_log_ratio_table,
    dsir_select,
    hashed_ngram_counts,
    ngram_bucket,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, grp string")


def test_word_ngrams_exact_multiset(spark):
    df = spark.createDataFrame([(1, "a b c b c")], "id bigint, text string")
    out = df.select(F.explode(word_ngrams(F.col("text"), 2)).alias("g"))
    grams = sorted(r.g for r in out.collect())
    assert grams == ["a b", "b c", "b c", "c b"]  # non-distinct, ordered pairs


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "")], "id bigint, text string")
    out = df.select(F.size(word_ngrams(F.col("text"), 2)).alias("n")).collect()
    assert [r.n for r in out] == [0, 0]


def test_ngram_bucket_range_and_bits(spark):
    df = spark.range(200).select(F.concat(F.lit("tok"), F.col("id")).alias("s"))
    stats = df.select(ngram_bucket(F.col("s"), 64).alias("b")).agg(
        F.min("b"), F.max("b"), F.countDistinct("b")
    ).first()
    assert stats[0] >= 0 and stats[1] < 64
    assert stats[2] > 32  # 200 draws over 64 buckets must spread
    with pytest.raises(ValueError):
        ngram_bucket(F.col("s"), 65537)


def test_dsir_ranks_target_resembling_docs_first(spark):
    """Planted fixture: candidates written in the target's vocabulary must
    outrank candidates written in the background vocabulary."""
    target = [(i, "alpha beta gamma delta alpha beta", "tgt") for i in range(4)]
    lookalikes = [(10 + i, "alpha beta gamma delta epsilon", "raw") for i in range(3)]
    background = [(20 + i, "zeta eta theta iota kappa zeta", "raw") for i in range(3)]
    docs = _docs(spark, target + lookalikes + background)
    out = dsir_select(
        docs, "doc_id", "text", F.col("grp") == "tgt", k=6, n_buckets=64
    ).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: -r.dsir_score)]
    assert set(ranked[:3]) == {10, 11, 12}
    top_scores = {r.doc_id: r.dsir_score for r in out}
    assert min(top_scores[i] for i in (10, 11, 12)) > max(
        top_scores[i] for i in (20, 21, 22)
    )


def test_dsir_select_partitioning_invariant(spark):
    rows = [
        (i, f"tok{i % 7} tok{(i + 1) % 7} tok{(i * 3) % 11} tok{i % 5}",
         "tgt" if i % 4 == 0 else "raw")
        for i in range(40)
    ]
    docs = _docs(spark, rows)
    a = dsir_select(docs, "doc_id", "text", F.col("grp") == "tgt", k=10, n_buckets=64)
    b = dsir_select(
        docs.repartition(13), "doc_id", "text", F.col("grp") == "tgt", k=10,
        n_buckets=64,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_log_ratio_table_is_complete_and_bounded(spark):
    docs = _docs(
        spark,
        [(1, "a b c", "tgt"), (2, "c d e", "raw"), (3, "e f g h", "raw")],
    )
    per = hashed_ngram_counts(
        docs, "doc_id", "text", n=2, n_buckets=32, carry_cols=("grp",)
    ).withColumn("_is_target", F.col("grp") == "tgt")
    ratio = dsir_log_ratio_table(per, F.col("_is_target"), n_buckets=32)
    rows = ratio.collect()
    assert len(rows) == 32  # every bucket present, hit or not
    assert len({r.bucket for r in rows}) == 32
    # |lr| <= ln((T+aB)/a) + ln((R+aB)/a) in 1e-6 units — loose sanity bound
    assert all(abs(r.lr) < 20_000_000 for r in rows)


def test_empty_target_side_still_defined(spark):
    """With no target docs the ratio degenerates to the uniform-vs-raw
    contrast (all-alpha numerator) — defined, no NaN/overflow."""
    docs = _docs(spark, [(1, "a b c d", "raw"), (2, "c d e f", "raw")])
    out = dsir_select(docs, "doc_id", "text", F.col("grp") == "tgt", k=2, n_buckets=16)
    rows = out.collect()
    assert len(rows) == 2
    assert all(r.dsir_score == r.dsir_score for r in rows)  # not NaN


def test_bucket_hash_triple_parity(spark):
    """The bucket hash must be bit-identical across Spark (conv/md5),
    DuckDB (the q233 oracle's strpos digit fragment), and Python hashlib —
    the property that makes the whole selection hash-matchable.  Drawn
    over printable-unicode grams via hypothesis."""
    import duckdb
    import hashlib
    from hypothesis import HealthCheck, given, settings, strategies as st

    hexpos = "strpos('0123456789abcdef', substr(md5(gram), {j}, 1)) - 1"
    bucket_sql = (
        f"(({hexpos.format(j=1)}) * 4096 + ({hexpos.format(j=2)}) * 256 "
        f"+ ({hexpos.format(j=3)}) * 16 + ({hexpos.format(j=4)})) % 1024"
    )

    @settings(
        max_examples=15, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_characters="'"),
                min_size=0, max_size=40,
            ),
            min_size=1, max_size=8, unique=True,
        )
    )
    def check(grams):
        sdf = spark.createDataFrame([(g,) for g in grams], "gram string")
        got_spark = {
            r.gram: r.b
            for r in sdf.select("gram", ngram_bucket(F.col("gram"), 1024).alias("b")).collect()
        }
        con = duckdb.connect()
        con.register("g", __import__("pandas").DataFrame({"gram": grams}))
        got_duck = dict(con.execute(f"SELECT gram, {bucket_sql} FROM g").fetchall())
        got_py = {
            g: int(hashlib.md5(g.encode("utf-8")).hexdigest()[:4], 16) % 1024
            for g in grams
        }
        assert got_spark == got_duck == got_py

    check()
