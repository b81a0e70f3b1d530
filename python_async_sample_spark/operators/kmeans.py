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


def _dlit(x: float) -> str:
    """A double literal in Spark SQL text. ``repr`` of a Python float is the
    shortest decimal that round-trips to the same IEEE double, and Spark's
    parser (Java ``Double.parseDouble``) is correctly rounded, so the parsed
    literal is bit-identical to ``F.lit(float(x))``."""
    x = float(x)
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(x) + "D"


def _sq_dist_sql(vec_col: str, centroid: list[float]) -> str:
    """SQL text for the squared-distance fold against one centroid.

    Semantically identical to the DataFrame-API construction
    ``F.aggregate(F.zip_with(col, array(lits), (x,y) -> (x-y)*(x-y)), 0.0,
    (acc,v) -> acc+v)`` — same Catalyst operators, same sequential fold
    order, bit-identical results — but built as ONE ``F.expr`` parse instead
    of k*d ``F.lit`` py4j round-trips. At k=16, d=32, 5 iterations the
    literal-by-literal construction spent ~12 s of pure driver time building
    expressions (measured via cProfile: 26k py4j commands for one q227 run);
    the SQL-text form is milliseconds (guide §5: the driver should do almost
    no work)."""
    arr = "array(" + ",".join(_dlit(x) for x in centroid) + ")"
    return (
        f"aggregate(zip_with(`{vec_col}`, {arr}, (x, y) -> (x - y) * (x - y)), "
        "0.0D, (acc, v) -> acc + v)"
    )


def _sq_dist(vec_col: str, centroid: list[float]) -> F.Column:
    return F.expr(_sq_dist_sql(vec_col, centroid))


def assign_clusters(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Append ``cluster`` (0-based nearest centroid) and ``sq_dist`` columns.
    Pure expression tree — k distance expressions, argmin via
    array_position(array_min); JVM codegen, no Python, no shuffle.

    Each squared distance is quantized to 9 decimals BEFORE the argmin
    (ADVICE r4): Spark's sequential array fold and DuckDB's group-by sum
    add the per-dim terms in different orders, so near-equal distances can
    differ by ulps and flip an assignment or a rank tie-break.  Snapping
    both engines' distances to the same 1e-9 grid shrinks the divergence
    window from "any ulp-adjacent pair" to "values within an ulp of a
    grid BOUNDARY" (the rounding algorithms differ — Spark decimal
    HALF_UP vs DuckDB float nearbyint — so boundary-straddling values
    remain a theoretical residual; no grid eliminates it for inputs the
    two engines sum differently).  The oracle rounds its ``d2`` to the
    same grid in every CTE, iteration AND final assignment alike.  At
    1e-9 the quantization is far below any meaningful cluster
    geometry."""
    dists = F.expr(
        "array(" + ",".join(f"round({_sq_dist_sql(vec_col, c)}, 9)" for c in centroids) + ")"
    )
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
    round_digits: int | None = None,
) -> tuple[list[list[float]], list[float]]:
    """Run ``iters`` Lloyd iterations; returns (centroids, inertia history).

    Each iteration: one scan for assignment (expression tree), one k*d-cell
    shuffle for the mean update, one k*d-row collect. Empty clusters keep
    their previous centroid (deterministic; no re-seeding randomness).
    Inertia is recorded BEFORE each update, so history[i] is the cost of
    the iteration-i centroids and must be non-increasing.

    ``round_digits`` quantizes each updated centroid coordinate (Spark-side
    ``round``, half-up like DuckDB's): float means are summation-order
    dependent across engines/partitionings, so *quantized Lloyd's* is what
    makes the whole trajectory — assignments included — reproducible bit-
    for-bit against the :func:`kmeans_oracle_sql` DuckDB replay.  At 6
    digits the perturbation is ~1e-6 per coordinate, far below any
    meaningful cluster geometry."""
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
        mean_expr = (
            F.avg("val") if round_digits is None else F.round(F.avg("val"), round_digits)
        )
        agg = (
            assigned.select(
                "cluster", "sq_dist", F.posexplode("__v").alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(mean_expr.alias("mean"), F.sum("sq_dist").alias("__in"))
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


def kmeans_cte_parts(
    table: str,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int,
    round_digits: int = 6,
) -> list[str]:
    """The DuckDB CTE chain replaying quantized Lloyd's, as bare CTE
    definitions (no ``WITH``): ``pts``/``dims`` (the exploded vectors),
    ``cd0..cd{iters}`` (centroid trajectories), ``a0..`` (per-iteration
    assignments) and finally ``afin(id, cluster, d2)`` — the final
    assignment with its quantized squared distance.  ``kmeans_oracle_sql``
    appends the per-cluster report; composite oracles (SemDeDup's
    cluster-then-prune) append their own CTEs on top of ``afin``."""
    parts = [
        f"pts AS (SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS v FROM {table})",
        # 0-based dims to match posexplode
        "dimspine AS (SELECT unnest(generate_series(1, (SELECT max(len(v)) FROM pts))) AS i)",
        "dims AS (SELECT id, i - 1 AS dim, v[i] AS val FROM pts CROSS JOIN dimspine WHERE i <= len(v))",
        f"""c0 AS (
          SELECT row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR))) - 1 AS cluster, v
          FROM pts ORDER BY md5(CAST(id AS VARCHAR)) LIMIT {k}
        )""",
        "cd0 AS (SELECT cluster, i - 1 AS dim, v[i] AS val FROM c0 CROSS JOIN dimspine WHERE i <= len(v))",
    ]
    for i in range(iters):
        parts.append(
            f"""a{i} AS (
              SELECT id, cluster FROM (
                SELECT s.id, s.cluster,
                       row_number() OVER (PARTITION BY s.id
                                          ORDER BY s.d2, s.cluster) AS rn
                FROM (
                  SELECT p.id, c.cluster,
                         round(sum((p.val - c.val) * (p.val - c.val)), 9) AS d2
                  FROM dims p JOIN cd{i} c USING (dim)
                  GROUP BY 1, 2
                ) s
              ) WHERE rn = 1
            )"""
        )
        parts.append(
            f"""cd{i + 1} AS (
              SELECT c.cluster, c.dim,
                     coalesce(round(m.mean, {round_digits}), c.val) AS val
              FROM cd{i} c LEFT JOIN (
                SELECT a.cluster, p.dim, avg(p.val) AS mean
                FROM a{i} a JOIN dims p USING (id)
                GROUP BY 1, 2
              ) m ON m.cluster = c.cluster AND m.dim = c.dim
            )"""
        )
    parts.append(
        f"""afin AS (
          SELECT id, cluster, d2 FROM (
            SELECT s.id, s.cluster, s.d2,
                   row_number() OVER (PARTITION BY s.id ORDER BY s.d2, s.cluster) AS rn
            FROM (
              SELECT p.id, c.cluster,
                     round(sum((p.val - c.val) * (p.val - c.val)), 9) AS d2
              FROM dims p JOIN cd{iters} c USING (dim)
              GROUP BY 1, 2
            ) s
          ) WHERE rn = 1
        )"""
    )
    return parts


def kmeans_oracle_sql(
    table: str,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int,
    round_digits: int = 6,
    out_round: int = 4,
) -> str:
    """Chained-CTE DuckDB replay of quantized Lloyd's k-means — certifies
    the ALGORITHM (init, assignment argmin with lowest-id tie-break, mean
    update with empty-cluster carry-over, final predict) against an
    independent engine, the same oracle style as ``pagerank_oracle_sql``.

    Exact mirrors of :func:`kmeans_fit` semantics:

    * init = the k rows with smallest ``md5(CAST(id AS VARCHAR))`` (hex
      md5 compares identically on both engines), centroids UNROUNDED;
    * assignment = argmin of squared distance QUANTIZED to 9 decimals on
      both engines (summation orders differ, so raw doubles can disagree
      by ulps on near-ties — see :func:`assign_clusters`), ties to the
      lowest cluster index (Spark's ``array_position(array_min)`` takes
      the first hit);
    * update = per-(cluster, dim) mean rounded to ``round_digits``
      (quantized Lloyd's — see :func:`kmeans_fit`), empty clusters keep
      their previous coordinate via the LEFT JOIN coalesce;
    * output = per-cluster size + mean squared distance under the FINAL
      centroids, rounded to ``out_round``.
    """
    return (
        "WITH "
        + ",\n".join(kmeans_cte_parts(table, id_col, vec_col, k, iters, round_digits))
        + f"""
        SELECT CAST(cluster AS INT) AS cluster,
               CAST(count(*) AS BIGINT) AS n_points,
               round(avg(d2), {out_round}) AS avg_sq_dist
        FROM afin GROUP BY cluster ORDER BY cluster"""
    )




def kmeans_predict(
    df: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """(id, cluster, sq_dist) for every row under the given centroids."""
    vecs = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    return assign_clusters(vecs, "__v", centroids).select(
        id_col, "cluster", "sq_dist"
    )
