"""Distributed Bloom filter build + probe-side join pruning.

The scale problem: a semi-join of a 100 TB probe table against a selective
build side shuffles the ENTIRE probe side on the key before a single row is
dropped. Catalyst injects runtime bloom filters for exactly this reason
(`spark.sql.optimizer.runtime.bloomFilter.enabled`), but only inside a
single query's join — this module surfaces the same pattern as a reusable
operator, so a pipeline can build a filter ONCE (KBs, broadcastable,
persistable) and prune many probe passes before their shuffles.

Build: each build key sets ``k`` bits of an ``m``-bit filter; the filter
materializes as a (word_index, word) relation — k exploded rows per key,
one ``bit_or`` aggregation. No driver-side state, no UDF, no collect.

Probe: each probe row recomputes its k (word, mask) pairs, joins the
broadcast filter, and survives only if ALL k bits are set. Guarantees of
the classic Bloom contract hold: NO false negatives (every true match
survives — q112's exact-semi-join oracle proves it), false positives at
the standard (1-e^{-kn/m})^k rate, removed by the exact verify that
follows the prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalized_key(df: DataFrame, key_col: str):
    """xxhash64 hashes IntegerType and LongType DIFFERENTLY, so a filter
    built on a bigint key silently false-negatives against an int probe
    key — fatal for the no-false-negative contract. Normalize every
    integral key to long on BOTH sides before hashing."""
    dt = df.schema[key_col].dataType
    col = F.col(key_col)
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return col.cast("long")
    return col


def _bit_positions(col, k: int, m_bits: int, hash_fn=None):
    """k (word, mask) structs for ``col`` under seeds 0..k-1 — xxhash64
    JVM-side, no Python in the path. ``hash_fn(col, i)`` swaps the family
    (e.g. ``sketches.portable_hash`` for a DuckDB-replayable filter)."""
    out = []
    for i in range(k):
        raw = hash_fn(col, i) if hash_fn is not None else F.xxhash64(col, F.lit(i))
        h = F.pmod(raw, F.lit(m_bits))
        # call_function: F.shiftleft only takes a literal shift count, the
        # SQL function accepts a column
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (h % 64).cast("int")
        )
        out.append(
            F.struct(
                (h / 64).cast("long").alias("word"),
                mask.alias("mask"),
            )
        )
    return F.array(*out)


def build_bloom(
    build: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 5, hash_fn=None
) -> DataFrame:
    """Aggregate the build side's keys into a (word, word_mask) filter
    relation of at most ``m_bits/64`` rows."""
    return (
        build.select(F.explode(_bit_positions(_normalized_key(build, key_col), k, m_bits, hash_fn)).alias("b"))
        .select("b.word", "b.mask")
        .groupBy("word")
        .agg(F.bit_or("mask").alias("word_mask"))
    )


def bloom_might_contain(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 5,
    hash_fn=None,
) -> DataFrame:
    """Keep probe rows whose key might be in the filter (all k bits set).

    The filter relation folds into ONE map row (≤ ``m_bits/64`` entries)
    broadcast onto the probe; the k bit tests run as a ``forall`` over the
    row's precomputed (word, mask) pairs — no explode, no re-aggregation
    of the probe side, probe rows stream through a single filter stage."""
    bloom_map = bloom.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "word_mask"))).alias("__bm")
    )
    tagged = probe.withColumn(
        "__bp", _bit_positions(_normalized_key(probe, key_col), k, m_bits, hash_fn)
    ).crossJoin(F.broadcast(bloom_map))
    keep = F.forall(
        "__bp",
        lambda b: (
            F.coalesce(F.element_at(F.col("__bm"), b.getField("word")), F.lit(0))
            .bitwiseAND(b.getField("mask"))
            == b.getField("mask")
        ),
    )
    return tagged.where(keep).drop("__bp", "__bm")


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Semi-join with bloom pre-pruning: probe rows are cut by the compact
    broadcast filter BEFORE the exact verify's shuffle, and the exact
    left-semi join removes the bloom's false positives — the result is
    row-identical to ``probe.join(build, probe_key==build_key, 'left_semi')``.
    """
    bloom = build_bloom(build, build_key, m_bits, k)
    candidates = bloom_might_contain(probe, bloom, probe_key, m_bits, k)
    return candidates.join(
        build.select(F.col(build_key).alias("__bk")).distinct(),
        candidates[probe_key] == F.col("__bk"),
        "left_semi",
    )
