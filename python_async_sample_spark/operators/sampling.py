"""Deterministic sampling & splitting for training pipelines.

`df.sample`/`rand()` are seed-and-partitioning dependent — rerunning on a
repartitioned 100 TB corpus silently changes the sample. Everything here
derives randomness from a content hash (md5 of a key column), so splits are
(a) reproducible across runs, partitionings, and engines, (b) stable under
corpus growth (a document keeps its split forever), and (c) auditable in
SQL — the DuckDB oracle computes the same md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def hash_bucket(key_col: str, buckets: int = 100, salt: str = "") -> F.Column:
    """Stable bucket in [0, buckets): first 8 md5 hex chars of (salt ∥ key)
    as an integer, mod buckets. Content-addressed — independent of row
    order, partitioning, and engine."""
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % buckets


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float = 0.1, salt: str = "split"
) -> DataFrame:
    """Tag each row 'train'/'test' by hash bucket — the split survives
    re-partitioning, incremental appends, and engine changes."""
    cut = int(round(test_fraction * 100))
    return df.withColumn(
        "split",
        F.when(hash_bucket(key_col, 100, salt) < cut, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def stratified_take(
    df: DataFrame, strata_cols: list[str], key_col: str, n_per_stratum: int, salt: str = "sample"
) -> DataFrame:
    """Deterministic n-per-stratum sample: rank rows inside each stratum by
    content hash (a stable shuffle) and keep the first n. One window pass;
    no driver-side collection; the same rows come back on every engine."""
    order = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = W.partitionBy(*strata_cols).orderBy(order, F.col(key_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def weighted_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Per-stratum sampling rates — the training-mixture lever ("100% of
    wiki, 25% of web"). Keep a row iff its content-hash bucket falls under
    its stratum's cut; strata absent from ``fractions`` are dropped (rate
    0). Same determinism contract as the other samplers: pure function of
    content, reproducible on any engine or partitioning."""
    cut = F.lit(-1)
    for stratum, frac in sorted(fractions.items()):
        cut = F.when(F.col(strata_col) == stratum, F.lit(int(round(frac * 100)))).otherwise(cut)
    return df.where(hash_bucket(key_col, 100, salt) < cut)


def token_budget_take(
    df: DataFrame,
    group_col: str,
    key_col: str,
    tokens_col: str,
    budget: int,
    salt: str = "budget",
) -> DataFrame:
    """Fill a per-group token budget deterministically: rank rows inside each
    group by content hash (same stable-shuffle contract as
    ``stratified_take``; any priority column slots in for the hash), take
    rows while the inclusive running token total stays within ``budget``.

    This is the sampling primitive a pretraining mixture actually needs —
    budgets are specified in TOKENS, not row counts. One window pass per
    group (single shuffle on ``group_col``); a group larger than executor
    memory is a sort spill, not a failure."""
    order = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = (
        W.partitionBy(group_col)
        .orderBy(order, F.col(key_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return df.withColumn(
        "cum_tokens", F.sum(tokens_col).over(w).cast("bigint")
    ).where(F.col("cum_tokens") <= budget)


def weighted_reservoir_take(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "wres",
) -> DataFrame:
    """Weight-proportional k-per-group sample WITHOUT replacement
    (Efraimidis–Spiliotis A-ES by exponential race), content-addressed.

    Each row gets an exponential race key ``-ln(u)/w`` with ``u`` derived
    from the md5 content hash (uniform in (0,1], never 0) and ``w`` its
    weight; the k smallest keys per group are exactly a weighted reservoir
    sample.  Distribution-equivalent to sequential reservoir algorithms but
    expressed as rank-over-window — embarrassingly parallel, mergeable
    (top-k of per-partition top-ks), and deterministic: the same rows come
    back on any engine, partitioning, or run, and the oracle can recompute
    the identical sample in SQL."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("double")
    u = (h + 1) / F.lit(4294967296.0)
    # weights are used AS GIVEN (fractional weights are legitimate — e.g.
    # quality scores in (0,1]); rows with weight <= 0 have zero selection
    # probability and are excluded up front rather than clamped
    race = -F.log(u) / F.col(weight_col).cast("double")
    w = W.partitionBy(group_col).orderBy(race.asc(), F.col(key_col).asc())
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("sample_rank") <= k)
    )


def epoch_capped_allocation(
    per_group_tokens: DataFrame,
    group_col: str,
    tokens_col: str,
    *,
    budget: int,
    max_epochs_pct: int = 120,
) -> DataFrame:
    """Data-constrained mixing (Muennighoff et al., NeurIPS 2023): split a
    token ``budget`` across groups as EQUAL shares, except no group may be
    repeated past its epoch cap — ``cap = tokens·max_epochs_pct div 100``
    (120 = at most 1.2 epochs of a group's data).  The classic waterfilling
    allocation: capped groups take their cap, the rest share the remaining
    budget evenly at a common water level.

    Entirely exact integer arithmetic so both engines agree bit-for-bit:
    with groups ranked by ascending cap, the capped set is the prefix where
    ``cap_k·(n−k+1) + prefix_{k−1} ≤ B`` (monotone in k because caps
    ascend — LHS(k+1)−LHS(k) = (n−k)·(cap_{k+1}−cap_k) ≥ 0 — so one window
    pass finds it); the uncapped remainder ``R = B − Σ capped`` splits as
    ``R div m`` each plus one extra token to the ``R mod m`` lowest-ranked
    uncapped groups (largest-remainder, the q206 convention).  Σ alloc ==
    min(B, Σ cap) exactly — no token created or lost to rounding.

    Input is the per-group token relation (one row per group — aggregate
    the corpus FIRST; at 100 TB this operator runs on a group-count-sized
    relation, the window functions never see the corpus).  Returns
    (group, n_tokens, cap_tokens, alloc_tokens, epochs_micro) where
    ``epochs_micro = alloc·1e6 div n_tokens`` — the repetition factor in
    1e-6 units, integer-exact (the q233 micro-grid convention).
    """
    if max_epochs_pct <= 0:
        raise ValueError("max_epochs_pct must be positive")
    if budget < 0:
        raise ValueError("budget must be non-negative")
    g = (
        per_group_tokens.select(
            F.col(group_col).alias("grp"),
            F.col(tokens_col).cast("bigint").alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn(
            "cap_tokens",
            F.expr(f"CAST(n_tokens * {int(max_epochs_pct)} div 100 AS BIGINT)"),
        )
    )
    n = g.count()  # group-count-sized driver scalar (e.g. 20 sources)
    w = W.orderBy("cap_tokens", "grp")
    ranked = (
        g.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "prefix_prev",
            F.coalesce(
                F.sum("cap_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "capped",
            F.col("cap_tokens") * (F.lit(n) - F.col("rk") + 1) + F.col("prefix_prev")
            <= F.lit(budget),
        )
    )
    facts = ranked.groupBy().agg(
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("cap_tokens"))), F.lit(0)
        ).alias("capped_sum"),
        F.coalesce(F.sum(F.when(F.col("capped"), 1)), F.lit(0)).alias("k_capped"),
    )
    out = ranked.crossJoin(F.broadcast(facts))
    # greatest(m, 1) keeps the div defined when every group is capped
    # (budget ≥ Σ cap); the CASE never selects that branch then.
    share = (
        f"CAST(({int(budget)} - capped_sum) div greatest({n} - k_capped, 1) AS BIGINT)"
    )
    extra = f"(({int(budget)} - capped_sum) % greatest({n} - k_capped, 1))"
    alloc = F.expr(
        "CASE WHEN capped THEN cap_tokens "
        f"WHEN {n} - k_capped = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE {share} + (CASE WHEN rk - k_capped <= {extra} THEN 1 ELSE 0 END) END"
    )
    return (
        out.select(
            F.col("grp").alias(group_col),
            "n_tokens",
            "cap_tokens",
            alloc.cast("bigint").alias("alloc_tokens"),
        )
        .withColumn(
            "epochs_micro",
            F.expr("CAST(alloc_tokens * 1000000 div n_tokens AS BIGINT)"),
        )
    )
