"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k with built-in higher-order functions
(zip_with + aggregate — JVM-side, no UDF). Scale path: random-hyperplane LSH
bucketing so each query only scores its bucket's candidates.

100 TB posture: the brute-force path broadcasts the (small) query set and
scans the corpus once — a map-side join, no shuffle of the corpus; the LSH
path shuffles once on bucket key. Nothing ever cross-joins corpus × corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a, b) -> F.Column:
    """Cosine similarity of two array<double> columns, built-ins only."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double(df: DataFrame, vec_col: str) -> DataFrame:
    """float32 arrays upcast once so all arithmetic is double (stable across
    engines and summation orders)."""
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self).

    ``queries`` is broadcast; score = one corpus scan; top-k via window.
    Returns (query_id, neighbor_id, cosine, rank).
    """
    c = as_double(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    q = as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_col(F.col("_qv"), F.col("_cv")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float, block_col: str | None = None
) -> DataFrame:
    """All pairs (d1 < d2) with cosine ≥ threshold — embedding near-dup.

    With ``block_col`` the self-join is restricted to equal blocks (e.g. an
    LSH bucket or a label); without it this is quadratic and should only run
    on samples or small corpora.
    """
    d = as_double(df, vec_col)
    a = d.select(F.col(id_col).alias("d1"), F.col(vec_col).alias("_v1"), *( [F.col(block_col).alias("_b1")] if block_col else [] ))
    b = d.select(F.col(id_col).alias("d2"), F.col(vec_col).alias("_v2"), *( [F.col(block_col).alias("_b2")] if block_col else [] ))
    cond = F.col("d1") < F.col("d2")
    if block_col:
        cond = cond & (F.col("_b1") == F.col("_b2"))
    return (
        a.join(b, cond)
        .withColumn("cosine", cosine_col(F.col("_v1"), F.col("_v2")))
        .where(F.col("cosine") >= threshold)
        .select("d1", "d2", "cosine")
    )


def cosine_pairs_gemm(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    num_blocks: int = 8,
) -> DataFrame:
    """All pairs (d1 < d2) with cosine ≥ threshold, via block-partitioned
    matrix multiplication.

    The scale design: rows are hashed into ``num_blocks`` blocks; each row is
    replicated to every block-pair it participates in (``num_blocks`` copies),
    then one Arrow-batched pandas kernel per (bi ≤ bj) block-pair computes the
    full similarity submatrix as a single numpy GEMM. Total arithmetic is the
    same O(N²·d) as the naive self-join, but it runs at BLAS speed instead of
    one interpreted expression tree per pair, and each block-pair is an
    independent task — at 1000 executors, set ``num_blocks`` ≈ √(2·tasks) and
    every task holds only 2·N/num_blocks vectors in memory.
    """
    blk = F.pmod(F.hash(F.col(id_col)), F.lit(num_blocks))
    # (bi, bj) pair keys this row participates in: (min(b, j), max(b, j)) ∀ j
    pair_keys = F.transform(
        F.sequence(F.lit(0), F.lit(num_blocks - 1)),
        lambda j: F.struct(
            F.least(blk, j).alias("bi"), F.greatest(blk, j).alias("bj")
        ),
    )
    exploded = (
        as_double(df, vec_col)
        .select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            blk.alias("_blk"),
            F.explode(F.array_distinct(pair_keys)).alias("_bp"),
        )
        .select("_id", "_v", "_blk", F.col("_bp.bi").alias("bi"), F.col("_bp.bj").alias("bj"))
    )

    empty = pd.DataFrame({"d1": [], "d2": [], "cosine": []})

    def kernel(key, pdf):
        bi, bj = key
        left = pdf[pdf["_blk"] == bi]
        if len(left) == 0:
            return empty
        xs = np.vstack(left["_v"].to_numpy())
        xs = xs / np.linalg.norm(xs, axis=1, keepdims=True)
        xid = left["_id"].to_numpy()
        if bi == bj:
            sim = xs @ xs.T
            iu, ju = np.triu_indices(len(xid), k=1)
            d1, d2, cos = xid[iu], xid[ju], sim[iu, ju]
        else:
            right = pdf[pdf["_blk"] == bj]
            if len(right) == 0:
                return empty
            ys = np.vstack(right["_v"].to_numpy())
            ys = ys / np.linalg.norm(ys, axis=1, keepdims=True)
            yid = right["_id"].to_numpy()
            sim = xs @ ys.T
            iu, ju = np.nonzero(sim >= threshold)
            d1, d2, cos = xid[iu], yid[ju], sim[iu, ju]
        keep = cos >= threshold
        d1, d2, cos = d1[keep], d2[keep], cos[keep]
        lo, hi = np.minimum(d1, d2), np.maximum(d1, d2)
        return pd.DataFrame({"d1": lo, "d2": hi, "cosine": cos})

    return exploded.groupBy("bi", "bj").applyInPandas(
        kernel, schema="d1 bigint, d2 bigint, cosine double"
    )


def hyperplane_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit string of ``n_planes``
    projections. Deterministic planes from a seeded RNG, shipped as array
    literals — the projection is zip_with/aggregate, JVM-side."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    d = as_double(df, vec_col)
    bucket = F.concat(
        *[
            F.when(
                _dot(
                    F.col(vec_col),
                    F.array(*[F.lit(float(v)) for v in planes[p]]),
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for p in range(n_planes)
        ]
    )
    return d.withColumn("bucket", bucket)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's bucket.
    Recall is tunable via n_planes (fewer planes → bigger buckets)."""
    cb = hyperplane_buckets(corpus, id_col, vec_col, n_planes, dim).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), F.col("bucket").alias("_bc")
    )
    qb = hyperplane_buckets(queries, id_col, vec_col, n_planes, dim).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), F.col("bucket").alias("_bq")
    )
    scored = (
        cb.join(F.broadcast(qb), (F.col("_bc") == F.col("_bq")) & (F.col("neighbor_id") != F.col("query_id")))
        .withColumn("cosine", cosine_col(F.col("_qv"), F.col("_cv")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("bigint")).where(
        F.col("rank") <= k
    )
