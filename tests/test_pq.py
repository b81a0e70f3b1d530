"""Product-quantization (PQ) ANN invariants: encode determinism, quantization
error vs training, ADC vs exact consistency, refined recall, and the loud
recall floor."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_async_sample_spark.operators.pq import (
    brute_force_topk_l2,
    pq_encode,
    pq_fit,
    pq_topk_adc,
    pq_topk_refined,
)
from python_async_sample_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def fitted(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_fit(emb, "vec_id", "embedding", m=8, ksub=16, iters=2)
    return emb, cbs


def test_codebook_shape_and_codes_in_range(spark, fitted):
    emb, cbs = fitted
    assert len(cbs) == 8 and all(len(cb) == 16 for cb in cbs)
    assert all(len(cent) == 8 for cb in cbs for cent in cb)
    codes = pq_encode(emb, "vec_id", "embedding", cbs)
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_encode_partitioning_invariant(spark, fitted):
    emb, cbs = fitted
    a = {(r["vec_id"], tuple(r["codes"])) for r in pq_encode(emb, "vec_id", "embedding", cbs).collect()}
    b = {
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(emb.repartition(13), "vec_id", "embedding", cbs).collect()
    }
    assert a == b


def _recon_err(emb, cbs) -> float:
    """Mean squared reconstruction error of the corpus under ``cbs`` —
    Lloyd's objective at the post-assignment point."""
    cb = np.asarray(cbs)
    rows = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).collect()
    vecs = {r["vec_id"]: np.asarray(r["v"]) for r in rows}
    codes = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(emb, "vec_id", "embedding", cbs).collect()
    }
    err = 0.0
    for vid, v in vecs.items():
        recon = np.concatenate([cb[s][codes[vid][s]] for s in range(len(cbs))])
        err += float(((v - recon) ** 2).sum())
    return err / len(vecs)


def test_training_reduces_quantization_error_monotonically(spark, sf_dir):
    """Per-subspace quantized Lloyd's must not increase the reconstruction
    error at any iteration (tolerance covers the 1e-6 centroid-mean
    quantization) and must strictly improve on the sampled seeds overall."""
    emb = load_table(spark, sf_dir, "embeddings")
    errs = [
        _recon_err(emb, pq_fit(emb, "vec_id", "embedding", m=8, ksub=16, iters=i))
        for i in range(3)
    ]
    assert all(errs[i + 1] <= errs[i] + 1e-5 for i in range(len(errs) - 1)), errs
    assert errs[-1] < errs[0]


def test_adc_matches_local_replay(spark, fitted):
    """ADC distances must equal the LUT arithmetic replayed locally on the
    encoded corpus — pins the kernel's gather/sum/round exactly."""
    emb, cbs = fitted
    queries = emb.where(F.col("vec_id") % 100 == 0)
    codes_df = pq_encode(emb, "vec_id", "embedding", cbs)
    out = pq_topk_adc(codes_df, queries, cbs, k=5).collect()
    cb = np.asarray(cbs)
    codes = {r["vec_id"]: r["codes"] for r in codes_df.collect()}
    qvecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in queries.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")).collect()
    }
    dsub = cb.shape[2]
    for r in out:
        q = qvecs[r["query_id"]]
        lut_sum = 0.0
        for s in range(cb.shape[0]):
            c = cb[s][codes[r["neighbor_id"]][s]]
            qs = q[s * dsub : (s + 1) * dsub]
            lut_sum += float(np.round(((qs - c) ** 2).sum(), 9))
        assert abs(float(np.round(lut_sum, 9)) - r["approx_d2"]) < 1e-9


def test_refined_recall_beats_floor_and_pure_adc(spark, fitted):
    emb, cbs = fitted
    queries = emb.where(F.col("vec_id") % 100 == 0)
    codes = pq_encode(emb, "vec_id", "embedding", cbs)
    exact = brute_force_topk_l2(emb, queries, k=10).select("query_id", "neighbor_id")
    total = exact.count()

    refined = pq_topk_refined(codes, queries, cbs, emb, k=10, shortlist=400)
    hits = refined.select("query_id", "neighbor_id").join(
        exact, ["query_id", "neighbor_id"], "left_semi"
    ).count()
    assert hits / total >= 0.7  # the q223 in-plan floor (round-8 raise)

    adc = pq_topk_adc(codes, queries, cbs, k=10)
    adc_hits = adc.select("query_id", "neighbor_id").join(
        exact, ["query_id", "neighbor_id"], "left_semi"
    ).count()
    assert hits >= adc_hits  # re-ranking never loses recall at equal k


def test_refined_distances_are_exact(spark, fitted):
    """Every refined hit's d2 must equal the true squared distance."""
    emb, cbs = fitted
    queries = emb.where(F.col("vec_id") % 100 == 0)
    codes = pq_encode(emb, "vec_id", "embedding", cbs)
    out = pq_topk_refined(codes, queries, cbs, emb, k=5, shortlist=50).collect()
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")).collect()
    }
    for r in out:
        true = float(((vecs[r["query_id"]] - vecs[r["neighbor_id"]]) ** 2).sum())
        assert abs(r["d2"] - round(true, 9)) < 1e-6


def test_dim_not_divisible_raises(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(emb, "vec_id", "embedding", m=7, ksub=4, iters=0)


def test_non_integral_id_fails_loud(spark, sf_dir):
    """The bigint-id contract must fail with a clear TypeError up front,
    not an opaque Arrow cast error inside a kernel (round-8 ADVICE)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "vec_id", F.concat(F.lit("doc-"), F.col("vec_id"))
    )
    with pytest.raises(TypeError, match="integral"):
        pq_fit(emb, "vec_id", "embedding", m=8, ksub=4, iters=0)
    with pytest.raises(TypeError, match="integral"):
        pq_encode(emb, "vec_id", "embedding", [[[0.0] * 8] * 4] * 8)
    with pytest.raises(TypeError, match="integral"):
        pq_topk_adc(
            emb.select("vec_id").withColumn("codes", F.array(F.lit(0))),
            emb,
            [[[0.0] * 8] * 4] * 8,
        )


def test_incremental_encode_is_batch_local(spark, fitted):
    """q224's contract: under frozen codebooks, a vector's codes do not
    depend on what else is in the batch — history never needs re-encoding
    when new data arrives."""
    emb, cbs = fitted
    batch = emb.where(F.col("vec_id") % 4 == 0)
    alone = {
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(batch, "vec_id", "embedding", cbs).collect()
    }
    together = {
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(emb, "vec_id", "embedding", cbs).collect()
        if r["vec_id"] % 4 == 0
    }
    assert alone == together
