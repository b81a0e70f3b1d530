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
    ranked = [r.doc_id for r in sorted(out, key=lambda r: -r.dsir_score_micro)]
    assert set(ranked[:3]) == {10, 11, 12}
    top_scores = {r.doc_id: r.dsir_score_micro for r in out}
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
    assert all(r.dsir_score_micro is not None for r in rows)


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


def _dsir_reference(rows, targets, n_buckets, alpha, k):
    """Pure-Python DSIR: independent reimplementation (hashlib + math.log
    + the same 1e-6 fixed-point grid) of the full selection — hypothesis
    feeds arbitrary corpora and Spark must match EXACTLY, scores included."""
    import hashlib
    import math
    from collections import Counter
    from fractions import Fraction

    def bucket(g):
        return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:4], 16) % n_buckets

    per = {}
    for doc_id, text, grp in rows:
        w = text.split(" ")
        grams = [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]
        per[doc_id] = (grp in targets, Counter(bucket(g) for g in grams))
    t, r = Counter(), Counter()
    for is_t, c in per.values():
        (t if is_t else r).update(c)
    tt, rr = sum(t.values()), sum(r.values())
    ab = alpha * n_buckets
    # floor(x + 0.5): the identical convention Spark and the DuckDB oracle
    # spell out (ADVICE r9 — a bare round() here is Python's half-even on
    # the float, a THIRD rounding semantics)
    lr = {
        b: math.floor(
            (math.log((t.get(b, 0) + alpha) / (tt + ab))
             - math.log((r.get(b, 0) + alpha) / (rr + ab))) * 1_000_000 + 0.5
        )
        for b in range(n_buckets)
    }
    cand = []
    for doc_id, (is_t, c) in per.items():
        if is_t or not c:
            continue
        s = sum(cnt * lr[b] for b, cnt in c.items())
        n = sum(c.values())
        # exact half-away-from-zero integer rounding of s/n (micro-nats);
        # the first draft emitted round(s/n/1e6, 6) doubles and hypothesis
        # found the engine split at (s=-14875228, n=8): the quotient's
        # exact 7th-decimal half rounds differently under Spark's
        # shortest-repr HALF_UP vs Python/DuckDB's exact-binary rounding
        micro = (1 if s >= 0 else -1) * ((2 * abs(s) + n) // (2 * n))
        # order on the exact rational (sidesteps float-division ties in
        # the reference itself); Spark's IEEE divide agrees on all draws
        cand.append((Fraction(-s, n), doc_id, n, micro))
    cand.sort()
    return {(doc_id, n, score) for _, doc_id, n, score in cand[:k]}


def test_dsir_matches_pure_python_reference(spark):
    from hypothesis import HealthCheck, given, settings, strategies as st

    token = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])

    @st.composite
    def corpora(draw):
        n = draw(st.integers(min_value=2, max_value=16))
        rows = []
        for i in range(n):
            n_tok = draw(st.integers(min_value=0, max_value=12))
            text = " ".join(draw(token) for _ in range(n_tok))
            grp = draw(st.sampled_from(["tgt", "raw"]))
            rows.append((i, text, grp))
        return rows

    @settings(
        max_examples=10, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(corpora())
    def check(rows):
        docs = _docs(spark, rows)
        got = {
            (r.doc_id, r.n_ngrams, r.dsir_score_micro)
            for r in dsir_select(
                docs, "doc_id", "text", F.col("grp") == "tgt",
                k=5, n_buckets=32, alpha=0.5,
            ).collect()
        }
        want = _dsir_reference(rows, {"tgt"}, n_buckets=32, alpha=0.5, k=5)
        assert got == want

    check()
