"""Distributed Lloyd's k-means invariants."""

from __future__ import annotations

from python_async_sample_spark.operators.kmeans import (
    assign_clusters,
    kmeans_fit,
    kmeans_predict,
)
from python_async_sample_spark.sources.readers import load_table


def test_inertia_monotone_nonincreasing(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents, hist = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=4)
    assert len(hist) == 4
    assert all(hist[i + 1] <= hist[i] + 1e-6 for i in range(len(hist) - 1)), hist
    assert len(cents) == 8


def test_assignment_is_argmin_and_partitioning_invariant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents, _ = kmeans_fit(emb, "vec_id", "embedding", k=4, iters=2)
    out = kmeans_predict(emb, "vec_id", "embedding", cents)
    rows = out.collect()
    assert {r["cluster"] for r in rows} <= set(range(4))
    # argmin: assigned distance must beat every other centroid's distance
    import math

    sample = rows[:20]
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in emb.select("vec_id", "embedding").collect()
    }
    for r in sample:
        v = vecs[r["vec_id"]]
        dists = [sum((float(x) - c[i]) ** 2 for i, x in enumerate(v)) for c in cents]
        assert math.isclose(min(dists), r["sq_dist"], rel_tol=1e-9)
        assert r["cluster"] == dists.index(min(dists))
    # content-addressed init + expression assignment => same result on any
    # partitioning
    re_out = kmeans_predict(emb.repartition(13), "vec_id", "embedding", cents)
    a = {(r["vec_id"], r["cluster"]) for r in out.collect()}
    b = {(r["vec_id"], r["cluster"]) for r in re_out.collect()}
    assert a == b


def test_empty_cluster_keeps_previous_centroid(spark):
    # 3 identical points, k=2: one cluster must go empty and survive
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cents, hist = kmeans_fit(df, "vec_id", "embedding", k=2, iters=3)
    assert len(cents) == 2
    assert hist[-1] <= hist[0] + 1e-9


def test_assign_clusters_tie_breaks_to_lowest_index(spark):
    df = spark.createDataFrame([(1, [0.0])], "vec_id long, embedding array<double>")
    out = assign_clusters(
        df.selectExpr("vec_id", "cast(embedding as array<double>) as __v"),
        "__v",
        [[1.0], [-1.0]],
    ).collect()
    assert out[0]["cluster"] == 0


def test_kmeans_fit_caps_k_at_row_count(spark):
    """Review fix: fewer rows than k must not KeyError — k is capped and
    every row still gets a cluster."""
    from python_async_sample_spark.operators.kmeans import kmeans_fit

    rows = [(i, [float(i), float(-i)]) for i in range(3)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    cents, history = kmeans_fit(df, "id", "v", k=8, iters=2)
    assert len(cents) <= 3 and len(history) == 2
