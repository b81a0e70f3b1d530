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


def test_int8_quantization_contract(spark, sf_dir):
    from pyspark.sql.types import ArrayType, ByteType

    from python_async_sample_spark.operators.similarity import (
        cosine_col,
        dequantize,
        quantize_int8,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_int8(emb, "embedding")
    assert isinstance(q.schema["q_vec"].dataType, ArrayType)
    assert isinstance(q.schema["q_vec"].dataType.elementType, ByteType)

    d = dequantize(q, "q_vec", "q_scale", "deq")
    worst = d.select(
        F.max(
            F.abs(
                cosine_col(F.col("embedding").cast("array<double>"), F.col("deq"))
                - 1.0
            )
        ).alias("e")
    ).collect()[0]["e"]
    assert worst < 1e-3  # int8 reconstruction keeps cosine within 0.001

    # zero vectors stay representable: scale 0, all-zero code
    z = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>")
    row = quantize_int8(z, "embedding").collect()[0]
    assert row["q_scale"] == 0.0 and list(row["q_vec"]) == [0, 0, 0]


def test_recall_guard_fires_on_empty_output(spark):
    """The in-plan recall guard must fail loudly when the approximate
    result is COMPLETELY empty — the total-collapse scenario. A where()
    guard on output rows is never evaluated on zero rows; the union-poison
    construction is."""
    import pytest

    from python_async_sample_spark.plans.similarity_queries import _with_recall_guard

    exact = spark.createDataFrame(
        [(1, 2), (1, 3)], "query_id long, neighbor_id long"
    )
    empty = exact.where(F.lit(False))
    guarded = _with_recall_guard(empty, exact, floor=0.5, what="collapse-test")
    with pytest.raises(Exception, match="recall below floor"):
        guarded.collect()

    # and a clean result passes through unchanged
    ok = _with_recall_guard(exact, exact, floor=0.5, what="clean-test")
    assert sorted((r.query_id, r.neighbor_id) for r in ok.collect()) == [(1, 2), (1, 3)]


def test_guard_fires_under_count_only_actions(spark):
    """Regression: the driver's rows-only check is a count() — which never
    evaluates projected columns. A violated guard must fail count() too,
    and a clean guard must not disturb the row count."""
    import pytest
    from pyspark.sql import functions as F

    from python_async_sample_spark.plans.similarity_queries import _union_poison_guard

    out = spark.range(3).select(F.col("id").alias("v"))
    violated = spark.range(1).select(F.lit(1).alias("x"))
    with pytest.raises(Exception, match="count-path"):
        _union_poison_guard(out, violated, "count-path guard").count()
    clean = violated.where(F.lit(False))
    assert _union_poison_guard(out, clean, "unused").count() == 3


def test_all_pairs_topk_matches_broadcast_kernel(spark, sf_dir):
    """all_pairs_topk_gemm (blocked, nothing broadcast) must return exactly
    brute_force_topk's answer when the query set is the whole corpus —
    same ids, ranks, and cosines to fp tolerance."""
    from python_async_sample_spark.operators.similarity import (
        all_pairs_topk_gemm,
        brute_force_topk,
    )
    from python_async_sample_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine"], 9))
        for r in all_pairs_topk_gemm(emb, "vec_id", "embedding", k=3).collect()
    }
    b = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine"], 9))
        for r in brute_force_topk(emb, emb, "vec_id", "embedding", k=3).collect()
    }
    assert a == b


def test_all_pairs_topk_never_emits_self_pairs_when_k_exceeds_corpus(spark):
    """Review fix: with k >= N the masked -inf diagonal must not leak
    (v, v) self-matches into short candidate lists."""
    from python_async_sample_spark.operators.similarity import all_pairs_topk_gemm

    rows = [(i, [float(i == j) for j in range(4)]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = all_pairs_topk_gemm(df, "vec_id", "embedding", k=10).collect()
    assert got, "expected neighbor rows"
    for r in got:
        assert r["query_id"] != r["neighbor_id"]
        assert r["cosine"] == r["cosine"] and r["cosine"] > float("-inf")
    # each of the 3 vectors sees exactly the other 2
    from collections import Counter
    c = Counter(r["query_id"] for r in got)
    assert c == {0: 2, 1: 2, 2: 2}


def test_cosine_pairs_requires_blocking_and_plans_equi_join(spark):
    """VERDICT r3 item 4: the unblocked quadratic variant is unreachable —
    block_col is required (falsy → ValueError), and the blocked path plans
    a keyed equi-join, never a cartesian/nested-loop product."""
    import pytest

    from python_async_sample_spark.operators.similarity import cosine_pairs

    df = spark.createDataFrame(
        [(0, [1.0, 0.0], "a"), (1, [1.0, 0.0], "a"), (2, [0.0, 1.0], "b"),
         (3, [0.0, 1.0], "b")],
        "vid long, emb array<double>, bucket string",
    )
    with pytest.raises(TypeError):
        cosine_pairs(df, "vid", "emb", 0.9)  # block_col is not optional
    with pytest.raises(ValueError, match="blocking column"):
        cosine_pairs(df, "vid", "emb", 0.9, None)

    pairs = cosine_pairs(df, "vid", "emb", 0.9, "bucket")
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {(r["d1"], r["d2"]) for r in pairs.collect()}
    assert got == {(0, 1), (2, 3)}  # cross-bucket pairs never compared
