"""Token-budget sampling determinism and budget adherence."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_async_sample_spark.operators.sampling import token_budget_take
from python_async_sample_spark.sources.readers import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )


def test_budget_is_inclusive_and_never_exceeded(spark, sf_dir):
    out = token_budget_take(_docs(spark, sf_dir), "source", "doc_id", "n_tokens", 600)
    per_source = (
        out.groupBy("source").agg(F.max("cum_tokens").alias("m")).collect()
    )
    assert per_source and all(r["m"] <= 600 for r in per_source)


def test_selection_is_partitioning_invariant(spark, sf_dir):
    base = _docs(spark, sf_dir)
    a = {
        r["doc_id"]
        for r in token_budget_take(base, "source", "doc_id", "n_tokens", 600).collect()
    }
    b = {
        r["doc_id"]
        for r in token_budget_take(
            base.repartition(13), "source", "doc_id", "n_tokens", 600
        ).collect()
    }
    assert a == b and a


def test_greedy_prefix_property(spark):
    # within one group, the kept set is a PREFIX of the hash order: no row
    # is skipped and a later row kept
    df = spark.createDataFrame(
        [(i, "g", 10) for i in range(20)], "doc_id long, source string, n_tokens long"
    )
    out = token_budget_take(df, "source", "doc_id", "n_tokens", 95)
    rows = out.collect()
    assert len(rows) == 9  # 9 * 10 = 90 <= 95 < 100
    assert max(r["cum_tokens"] for r in rows) == 90


def test_weighted_reservoir_exact_k_and_weight_bias(spark):
    from python_async_sample_spark.operators.sampling import weighted_reservoir_take

    rows = [("g", i, 1000 if i == 0 else 1) for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, id long, w long")
    # exact-k invariant: never more than k per group; min(k, n) when short
    out = weighted_reservoir_take(df, "grp", "id", "w", k=3).collect()
    assert len(out) == 3
    short = spark.createDataFrame(rows[:2], "grp string, id long, w long")
    assert weighted_reservoir_take(short, "grp", "id", "w", k=5).count() == 2
    # weight bias: across 40 salts, the item with 1000x weight must win the
    # k=1 draw far more often than uniform (P(win)=1000/1009 per draw)
    wins = 0
    for s in range(40):
        top = weighted_reservoir_take(df, "grp", "id", "w", k=1, salt=f"s{s}").collect()
        wins += top[0]["id"] == 0
    assert wins >= 30


def test_weighted_reservoir_partitioning_invariant(spark):
    from python_async_sample_spark.operators.sampling import weighted_reservoir_take

    rows = [(f"g{i % 3}", i, (i * 7) % 13 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "grp string, id long, w long")
    a = sorted(
        (r["grp"], r["id"], r["sample_rank"])
        for r in weighted_reservoir_take(df, "grp", "id", "w", k=4).collect()
    )
    b = sorted(
        (r["grp"], r["id"], r["sample_rank"])
        for r in weighted_reservoir_take(df.repartition(7), "grp", "id", "w", k=4).collect()
    )
    assert a == b


def test_weighted_reservoir_fractional_weights_and_zero_exclusion(spark):
    """Review fix: weights in (0,1) must stay weight-proportional (no clamp
    to 1), and weight<=0 rows are never sampled."""
    from python_async_sample_spark.operators.sampling import weighted_reservoir_take

    rows = [("g", 0, 0.95), ("g", 1, 0.05), ("g", 2, 0.0), ("g", 3, -1.0)]
    df = spark.createDataFrame(rows, "grp string, id long, w double")
    wins = 0
    for s in range(40):
        got = weighted_reservoir_take(df, "grp", "id", "w", k=1, salt=f"f{s}").collect()
        assert len(got) == 1 and got[0]["id"] in (0, 1)  # 2,3 excluded
        wins += got[0]["id"] == 0
    assert wins >= 30  # 0.95 vs 0.05 → id 0 wins ~95% of salts
