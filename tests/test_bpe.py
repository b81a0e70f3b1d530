"""Distributed BPE learning vs a sequential pure-Python reference."""

from __future__ import annotations

from collections import Counter

from python_async_sample_spark.operators.bpe import learn_bpe, segment_with_merges
from python_async_sample_spark.sources.readers import load_table

SEP = "\x1e"


def _ref_bpe(docs: list[str], n_merges: int, min_count: int = 2):
    corpora = [d.split(" ") for d in docs]
    merges = []
    for _ in range(n_merges):
        cnt = Counter()
        for syms in corpora:
            for x, y in zip(syms, syms[1:]):
                cnt[(x, y)] += 1
        if not cnt:
            break
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < min_count:
            break
        merges.append((a, b, c))
        j = a + SEP + b
        corpora = [_ref_apply(syms, a, b, j) for syms in corpora]
    return merges, corpora


def _ref_apply(syms, a, b, j):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = j
        else:
            out.append(x)
    return out


def test_learned_merges_match_sequential_reference(spark, sf_dir):
    docs_df = load_table(spark, sf_dir, "documents").where("doc_id % 17 = 0")
    docs = [r["text"] for r in docs_df.select("text").orderBy("doc_id").collect()]
    want, _ = _ref_bpe(docs, 8)
    got = learn_bpe(docs_df, "doc_id", "text", n_merges=8)
    assert got == want
    assert len(got) >= 3  # the corpus has enough repetition to learn from


def test_overlapping_pairs_merge_left_to_right(spark):
    df = spark.createDataFrame([(1, "a a a a a")], "doc_id long, text string")
    merges = learn_bpe(df, "doc_id", "text", n_merges=1)
    # 4 adjacent (a,a) slots but left-to-right application merges pairs
    # greedily; the COUNT reported is the raw adjacent-slot count
    assert merges == [("a", "a", 4)]
    seg = segment_with_merges(df, "doc_id", "text", merges).collect()[0]
    assert seg["syms"] == [f"a{SEP}a", f"a{SEP}a", "a"]


def test_segmentation_matches_reference(spark, sf_dir):
    docs_df = load_table(spark, sf_dir, "documents").where("doc_id % 17 = 0")
    docs_rows = docs_df.select("doc_id", "text").orderBy("doc_id").collect()
    merges, ref_corpora = _ref_bpe([r["text"] for r in docs_rows], 8)
    seg = {
        r["doc"]: r["syms"]
        for r in segment_with_merges(docs_df, "doc_id", "text", merges).collect()
    }
    for row, want_syms in zip(docs_rows, ref_corpora):
        assert seg[row["doc_id"]] == want_syms


def test_min_count_stops_early(spark):
    df = spark.createDataFrame([(1, "x y z w")], "doc_id long, text string")
    assert learn_bpe(df, "doc_id", "text", n_merges=5, min_count=2) == []


def test_return_corpus_equals_segment_with_merges(spark, sf_dir):
    """The corpus learn_bpe rewrote during training IS the encoded corpus:
    identical to replaying the learned merges from raw text (what q179's
    return_corpus fast path relies on)."""
    docs_df = load_table(spark, sf_dir, "documents").where("doc_id % 17 = 0")
    merges, corpus = learn_bpe(docs_df, "doc_id", "text", n_merges=6, return_corpus=True)
    replayed = segment_with_merges(docs_df, "doc_id", "text", merges)
    got = {r["doc"]: r["syms"] for r in corpus.select("doc", "syms").collect()}
    want = {r["doc"]: r["syms"] for r in replayed.select("doc", "syms").collect()}
    assert got == want
