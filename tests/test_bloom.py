"""Distributed Bloom filter: no false negatives, sane FP rate, prune works."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_async_sample_spark.operators.bloom import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom,
)


def test_no_false_negatives_and_bounded_fp(spark):
    build = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    probe = spark.range(0, 20_000).select(F.col("id").alias("k"))
    bloom = build_bloom(build, "k", m_bits=1 << 16, k=5)
    cand = bloom_might_contain(probe, bloom, "k", m_bits=1 << 16, k=5)

    true_members = {r.k for r in build.collect()} & {r.k for r in probe.collect()}
    got = {r.k for r in cand.collect()}
    # Bloom contract: every true member survives
    assert true_members <= got
    # FP rate for n=500, m=65536, k=5 is ~0.0002 — allow 100x slack
    fp = len(got - true_members)
    assert fp <= 0.02 * 20_000, fp


def test_bloom_semi_join_equals_exact(spark):
    build = spark.range(0, 300).select((F.col("id") * 13 + 1).alias("bk"))
    probe = spark.range(0, 5_000).select(
        F.col("id").alias("pk"), (F.col("id") % 97).alias("payload")
    )
    got = bloom_semi_join(probe, build, "pk", "bk")
    exact = probe.join(
        build.withColumnRenamed("bk", "pk").distinct(), "pk", "left_semi"
    )
    assert got.exceptAll(exact).count() == 0
    assert exact.exceptAll(got).count() == 0
    assert exact.count() > 0


def test_bloom_filter_persists_and_reloads(spark, tmp_path):
    """The build-once/persist/reuse claim: the filter relation round-trips
    through parquet and prunes identically after reload — and the
    integral-key normalization survives (an int-typed probe against the
    persisted bigint-built filter loses nothing)."""
    build = spark.range(0, 400).select((F.col("id") * 11).alias("k"))  # bigint
    path = str(tmp_path / "bloom")
    build_bloom(build, "k").write.parquet(path)

    reloaded = spark.read.parquet(path)
    probe_int = spark.range(0, 8_000).select(F.col("id").cast("int").alias("k"))
    cand = bloom_might_contain(probe_int, reloaded, "k")
    members = {r.k for r in build.collect()} & set(range(8_000))
    got = {r.k for r in cand.collect()}
    assert members <= got  # no false negatives across persist + type gap
    assert len(got - members) <= 160  # FP rate stays sane
