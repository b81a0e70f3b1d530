"""Recall tests for the approximate similarity paths (LSH, IVF) against the
exact brute-force baseline, and blocking-correctness for MinHash/SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_async_sample_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)
from python_async_sample_spark.sources.readers import load_table


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(approx, exact):
    hits = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
    total = sum(len(nbrs) for nbrs in exact.values())
    return hits / total


def test_ann_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = _topk_sets(brute_force_topk(emb, queries, k=10))

    ivf = _topk_sets(ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=8))
    # probing half the cells of a 16-cell index must find most true neighbors
    assert _recall(ivf, exact) >= 0.8

    lsh = _topk_sets(lsh_topk(emb, queries, k=10, n_planes=4, dim=64))
    # 4 planes → 16 buckets; same-bucket candidates only. Random-hyperplane
    # recall on near-uniform synthetic vectors is modest by design — assert
    # it beats the ~1/16 random-bucket floor by a wide margin.
    assert _recall(lsh, exact) >= 0.25


def test_ivf_matches_exact_when_probing_everything(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = _topk_sets(brute_force_topk(emb, queries, k=5))
    full = _topk_sets(ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=8))
    # probing every cell degrades IVF to exact search
    assert full == exact
