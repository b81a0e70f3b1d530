"""Distributed PCA vs numpy on the collected corpus."""

from __future__ import annotations

import numpy as np

from python_async_sample_spark.operators.pca import fit_pca, project
from python_async_sample_spark.sources.readers import load_table


def _collect_x(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    ids = [r["vec_id"] for r in rows]
    x = np.array([[float(v) for v in r["embedding"]] for r in rows])
    return ids, x


def test_components_match_numpy_eigh(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    comps, ev, mean, total = fit_pca(emb, "embedding", n_components=8)
    _, x = _collect_x(spark, sf_dir)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:8]
    want = v[:, order].T
    for k in range(8):
        j = int(np.argmax(np.abs(want[k])))
        if want[k, j] < 0:
            want[k] = -want[k]
    assert np.allclose(ev, w[order], atol=1e-8)
    assert np.allclose(comps, want, atol=1e-6)
    # orthonormal, variance sorted descending
    assert np.allclose(comps @ comps.T, np.eye(8), atol=1e-8)
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(7))


def test_projection_matches_numpy_and_is_expression_only(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    comps, _, mean, _total = fit_pca(emb, "embedding", n_components=4)
    out = project(emb, "vec_id", "embedding", comps, mean)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("Exchange", "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
    got = {r["vec_id"]: np.array(r["proj"]) for r in out.collect()}
    ids, x = _collect_x(spark, sf_dir)
    want = (x - x.mean(axis=0)) @ comps.T
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], want[i], atol=1e-8)


def test_partitioning_invariance(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    c1, e1, m1, t1 = fit_pca(emb, "embedding", n_components=3)
    c2, e2, m2, t2 = fit_pca(emb.repartition(13), "embedding", n_components=3)
    assert np.allclose(m1, m2, atol=1e-9)
    assert np.allclose(e1, e2, atol=1e-9)
    assert np.allclose(c1, c2, atol=1e-7)


def test_fit_pca_total_variance_is_trace_not_topk_sum(spark, sf_dir):
    """Review fix: ratios must normalize by the covariance TRACE; with
    k < d on a near-isotropic spectrum the top-k eigenvalue sum is far
    below the total, and the old normalization doubled every ratio."""
    import numpy as np

    from python_async_sample_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    _c, ev, _m, total = fit_pca(emb, "embedding", n_components=8)
    assert sum(ev) < 0.9 * total  # 8 of 64 near-equal components
    _c2, ev2, _m2, total2 = fit_pca(emb, "embedding", n_components=64)
    assert np.isclose(sum(ev2), total2, rtol=1e-8)
    assert np.isclose(total, total2, rtol=1e-8)
