"""Distributed Lloyd's k-means over an embedding column.

Beyond the reference's inventory: corpus curation clusters embeddings for
semantic dedup cohorts, topic balancing, and IVF coarse quantizers (the
driver-side sampled variant lives in ``operators/similarity._kmeans``; this
is the full-corpus distributed form).

Scale posture (100 TB of vectors, k small):

* ASSIGNMENT is a pure JVM expression tree — the k squared-distance
  expressions (``aggregate(zip_with(vec, centroid, ...))``) are codegen'd
  per row and argmin'd with ``array_position(array_min)``; no Python, no
  shuffle, one scan per iteration. Centroids enter the plan as literals
  (k x d doubles — bytes, not data).
* UPDATE is posexplode -> groupBy (cluster, dim) -> avg: one
  map-side-combinable shuffle of k*d cells per partition, then a k*d-row
  driver collect — bounded by construction (k and d are model
  hyperparameters, not data sizes).
* INIT is content-addressed: the k vectors with the smallest
  ``md5(id)`` — deterministic across runs, partitionings, and engines
  (``rand()``/``df.sample`` are not), fetched with a distributed
  take-ordered.

Euclidean (not spherical) updates so Lloyd's monotonicity holds exactly:
total inertia is non-increasing per iteration — asserted in
tests/test_kmeans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec_col: str, centroid: list[float]) -> F.Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col), c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Append ``cluster`` (0-based nearest centroid) and ``sq_dist`` columns.
    Pure expression tree — k distance expressions, argmin via
    array_position(array_min); JVM codegen, no Python, no shuffle."""
    dists = F.array(*[_sq_dist(vec_col, c) for c in centroids])
    return df.withColumn("__d", dists).select(
        "*",
        (F.array_position(F.col("__d"), F.array_min("__d")) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min("__d").alias("sq_dist"),
    ).drop("__d")


def init_centroids(df: DataFrame, id_col: str, vec_col: str, k: int) -> list[list[float]]:
    """Deterministic content-addressed init: the k rows with the smallest
    md5(id). A distributed take-ordered (each partition keeps k), so the
    driver touches exactly k vectors."""
    rows = (
        df.select(F.md5(F.col(id_col).cast("string")).alias("__h"), F.col(vec_col))
        .orderBy("__h")
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 5,
) -> tuple[list[list[float]], list[float]]:
    """Run ``iters`` Lloyd iterations; returns (centroids, inertia history).

    Each iteration: one scan for assignment (expression tree), one k*d-cell
    shuffle for the mean update, one k*d-row collect. Empty clusters keep
    their previous centroid (deterministic; no re-seeding randomness).
    Inertia is recorded BEFORE each update, so history[i] is the cost of
    the iteration-i centroids and must be non-increasing."""
    vecs = df.select(F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v"))
    # every Lloyd iteration re-reads the vector relation; materialize it
    # once (lineage cut, same pattern as connected components) instead of
    # rescanning the source per iteration. Keep the source's natural
    # partitioning: the per-iteration work is one narrow scan plus a
    # k*d-cell aggregate, so fanning a small input out to full parallelism
    # only multiplies fixed task overhead (measured ~2x at sf0.1); a real
    # 100 TB scan already has more splits than cores.
    vecs = vecs.localCheckpoint(eager=True)
    dim = len(vecs.select("__v").first()["__v"])
    cents = init_centroids(vecs, "__id", "__v", k)
    # an input with fewer rows than k seeds fewer centroids — cap k rather
    # than KeyError in the update step (every row still gets a cluster)
    k = len(cents)
    history: list[float] = []
    for _ in range(iters):
        assigned = assign_clusters(vecs, "__v", cents)
        agg = (
            assigned.select(
                "cluster", "sq_dist", F.posexplode("__v").alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("mean"), F.sum("sq_dist").alias("__in"))
            .collect()
        )
        # per-cluster inertia is replicated across its dim rows; count each once
        history.append(sum(r["__in"] for r in agg if r["dim"] == 0))
        new = {c: list(cent) for c, cent in enumerate(cents)}
        by_cluster: dict[int, list[float]] = {}
        for r in agg:
            by_cluster.setdefault(r["cluster"], [0.0] * dim)[r["dim"]] = r["mean"]
        new.update(by_cluster)
        cents = [new[c] for c in range(k)]
    return cents, history


def kmeans_predict(
    df: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """(id, cluster, sq_dist) for every row under the given centroids."""
    vecs = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    return assign_clusters(vecs, "__v", centroids).select(
        id_col, "cluster", "sq_dist"
    )
