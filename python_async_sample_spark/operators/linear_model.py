"""Distributed linear-classifier TRAINING: L2-SVM (squared hinge) by
full-batch gradient descent with a quantized weight trajectory.

Beyond the reference's inventory: corpus curation doesn't just *apply* a
quality classifier (q114 scoring, q146/q148 frozen-weight inference) — it
periodically RE-TRAINS one on labeled slices of the corpus.  This is the
training half, expressed the way k-means is (operators/kmeans.py): the
model state (a d-vector of weights) lives on the driver as plan literals,
and each optimization step is ONE expression-only aggregate over the
corpus.

Scale posture (100 TB of rows, d small):

* Each GD iteration is a single scan computing d+1 sums (the d gradient
  components and the batch loss) — map-side-combinable, pure JVM
  expression tree, no Python, no shuffle beyond the d+1-cell final
  aggregate.  Weights enter the plan as literals (d doubles).
* The driver touches exactly d+1 doubles per iteration — bounded by the
  model dimension, never by data size.
* Squared hinge (LIBLINEAR's L2-SVM loss) keeps the whole trajectory in
  +,-,*,/ and ``greatest`` — NO transcendentals — so unlike logistic
  regression (whose ``exp`` differs in ulps between libm implementations)
  every per-row quantity is bit-identical across engines, and the only
  cross-engine divergence is summation order.  Quantizing each weight
  update to ``round_digits`` (in-engine HALF_UP round, same as quantized
  Lloyd's — see kmeans_fit) makes the full trajectory replayable in
  DuckDB: :func:`squared_hinge_oracle_sql`.

Reference tie-in: the per-glass least-squares fit (reference
R/basic_fun.R:18-43) is the same shape — a small parametric model fit by
closed-form normal equations; this operator is its iterative-loss sibling
for losses with no closed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _margin(weights: list[float], feature_cols: list[str]) -> F.Column:
    """w . x as a FIXED left-associated expression chain: w0*x0 + w1*x1 + ...
    Both Spark and DuckDB parse the same spelling left-to-right, so the
    per-row double is bit-identical across engines (no aggregate here)."""
    m = F.lit(weights[0]) * F.col(feature_cols[0])
    for w, c in zip(weights[1:], feature_cols[1:]):
        m = m + F.lit(w) * F.col(c)
    return m


def squared_hinge_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    iters: int = 10,
    lr: float = 0.2,
    round_digits: int = 6,
    materialize: bool = True,
) -> tuple[list[float], list[float]]:
    """Train w minimizing mean squared hinge  avg(max(0, 1 - y*(w.x))^2)
    by full-batch GD; returns (weights, loss history).

    Per iteration: one scan, one (d+1)-cell aggregate, one d-double
    collect.  The updated weight  round(w_j - lr*g_j/n, round_digits)
    is computed IN-ENGINE (Spark HALF_UP round, matching DuckDB's round;
    Python's round() is banker's and would diverge).  labels must be
    +1.0/-1.0; features should be O(1)-scaled so lr=0.2 sits under the
    2/L stability bound (L <= 2*max||x||^2).

    Every iteration re-reads the feature relation, so it is materialized
    once (lineage cut, same pattern as kmeans_fit); pass
    ``materialize=False`` when ``df`` is already checkpointed to avoid a
    second pass over the data.
    """
    feats = df.select(F.col(label_col).alias("y"), *feature_cols)
    if materialize:
        feats = feats.localCheckpoint(eager=True)
    n = float(feats.count())
    d = len(feature_cols)
    w = [0.0] * d
    history: list[float] = []
    for _ in range(iters):
        viol = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("y") * _margin(w, feature_cols))
        aggs = [
            F.round(
                F.lit(w[j])
                - F.lit(lr)
                * F.sum((F.lit(-2.0) * F.col("y") * F.col(c)) * viol)
                / F.lit(n),
                round_digits,
            ).alias(f"w{j}")
            for j, c in enumerate(feature_cols)
        ] + [F.sum(viol * viol).alias("loss")]
        row = feats.agg(*aggs).first()
        history.append(row["loss"] / n)
        w = [float(row[f"w{j}"]) for j in range(d)]
    return w, history


def squared_hinge_oracle_sql(
    feature_sql: str,
    feature_exprs: list[str],
    iters: int = 10,
    lr: float = 0.2,
    round_digits: int = 6,
    out_round: int = 4,
) -> str:
    """Chained-CTE DuckDB replay of the full GD trajectory — certifies the
    ALGORITHM (zero init, fixed-order margin, squared-hinge gradient,
    quantized update) against an independent engine, the same oracle style
    as ``kmeans_oracle_sql``.

    ``feature_sql`` must yield columns y, x0..x{d-1} with the SAME
    fixed-order arithmetic as the Spark side (every per-row double is then
    bit-identical; only cross-row sums differ, which the per-iteration
    round absorbs).  Every w/g CTE is MATERIALIZED: DuckDB inlines plain
    CTEs per reference, and a 10-deep chain with 2 references per link
    re-executes an exponential prefix otherwise (see verify notes).

    Output: one row per weight (idx, weight) plus the training metrics
    under the FINAL weights (n_rows, accuracy, sq_hinge_loss).
    """
    d = len(feature_exprs)
    xs = [f"x{j}" for j in range(d)]

    def margin(w_alias: str) -> str:
        return " + ".join(f"{w_alias}.w{j}*{x}" for j, x in enumerate(xs))

    parts = [
        f"WITH f AS MATERIALIZED ({feature_sql})",
        "nn AS (SELECT count(*) * 1.0 AS n FROM f)",
        "w0 AS (SELECT " + ", ".join(f"0.0 AS w{j}" for j in range(d)) + ")",
    ]
    for i in range(iters):
        viol = f"greatest(0.0, 1.0 - y*({margin('w')}))"
        gsums = ", ".join(
            f"sum((-2.0)*y*{x}*{viol}) AS g{j}" for j, x in enumerate(xs)
        )
        parts.append(f"g{i} AS MATERIALIZED (SELECT {gsums} FROM f, w{i} w)")
        upd = ", ".join(
            f"round(w.w{j} - {lr}*g.g{j}/nn.n, {round_digits}) AS w{j}"
            for j in range(d)
        )
        parts.append(
            f"w{i + 1} AS MATERIALIZED (SELECT {upd} FROM w{i} w, g{i} g, nn)"
        )
    mfin = margin("w")
    violfin = f"greatest(0.0, 1.0 - y*({mfin}))"
    parts.append(
        f"""metrics AS (
          SELECT CAST(count(*) AS BIGINT) AS n_rows,
                 round(avg(CASE WHEN (CASE WHEN {mfin} > 0 THEN 1.0 ELSE -1.0 END) = y
                           THEN 1.0 ELSE 0.0 END), {out_round}) AS accuracy,
                 round(avg({violfin}*{violfin}), {out_round}) AS sq_hinge_loss
          FROM f, w{iters} w
        )"""
    )
    parts.append(
        "sel AS ("
        + " UNION ALL ".join(
            f"SELECT {j} AS idx, w{j} AS weight FROM w{iters}" for j in range(d)
        )
        + ")"
    )
    return (
        ",\n".join(parts)
        + """
        SELECT CAST(idx AS INT) AS idx, weight, n_rows, accuracy, sq_hinge_loss
        FROM sel CROSS JOIN metrics ORDER BY idx"""
    )


def evaluate_margin_metrics(
    feats: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    label_col: str = "y",
    out_round: int = 4,
) -> DataFrame:
    """(n_rows, accuracy, sq_hinge_loss) of the final weights over feats —
    the Spark mirror of the oracle's metrics CTE.  The margin sign test is
    exact (per-row doubles are bit-identical); only the loss average needs
    the round."""
    m = _margin(weights, feature_cols)
    viol = F.greatest(F.lit(0.0), F.lit(1.0) - F.col(label_col) * m)
    pred = F.when(m > 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    return feats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(
            F.avg(F.when(pred == F.col(label_col), 1.0).otherwise(0.0)), out_round
        ).alias("accuracy"),
        F.round(F.avg(viol * viol), out_round).alias("sq_hinge_loss"),
    )
