"""Sequence packing for LLM training — concat-and-chunk token accounting.

Training pipelines concatenate documents (within a shard/language stream)
and slice the token stream into fixed-size sequences; a document may span a
chunk boundary. The assignment is pure window arithmetic over a running
token sum — no UDF, no driver loop — and is deterministic given the
(group, order) columns.

Scale shape: ONE window partitioned by the stream key. Never pack a 100 TB
corpus as a single global stream — the window partition is the unit of
parallelism (language, shard, source), exactly how production packers run
per input shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def pack_sequences(
    df: DataFrame,
    stream_cols: list[str],
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Assign each document its place in the packed token stream.

    Adds, per (stream, order) position:
      cum_before   — tokens already emitted in this stream,
      pack_id      — chunk index of the document's first token,
      pack_offset  — offset of that token within its chunk,
      pack_end     — chunk index of the document's last token,
      spans_packs  — how many chunk boundaries the document crosses + 1.
    """
    w = (
        W.partitionBy(*stream_cols)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (
        df.withColumn("cum_before", cum_before.cast("bigint"))
        .withColumn("pack_id", F.floor(F.col("cum_before") / budget))
        .withColumn("pack_offset", F.col("cum_before") % budget)
        .withColumn(
            "pack_end",
            F.floor((F.col("cum_before") + F.greatest(F.col(token_col), F.lit(1)) - 1) / budget),
        )
        .withColumn("spans_packs", (F.col("pack_end") - F.col("pack_id") + 1).cast("bigint"))
    )


def assign_shards(
    packed: DataFrame,
    n_shards: int,
    pack_col: str = "pack_id",
    shard_key: str = "pack",
) -> DataFrame:
    """Assign each packed document to one of ``n_shards`` output shards.

    Precondition: documents are pre-chunked to at most the packing budget
    (the standard pipeline order — chunk, pack, shard). In both modes a
    document always follows its first token's chunk, so a chunk is never
    split across shards — no second pass, no driver-side greedy
    bin-packing, no shuffle beyond the write's own partitioning.

    ``shard_key="pack"`` (default, round-robin): shard = chunk index mod
    ``n_shards``. HARD structural guarantee: chunk COUNTS per shard differ
    by at most one over the occupied chunk range, and each chunk carries
    under two budgets of starting mass. Token-sum balance is STATISTICAL,
    not worst-case: chunk masses concentrate near one budget for real
    corpora, but a periodic adversarial stream (e.g. doc sizes 15,16,1
    repeating against budget 16 and 2 shards) aligns heavy chunks with one
    residue class and skews token sums linearly in stream length (the
    hypothesis counterexample recorded in round 7).

    ``shard_key="hash"``: shard = ``portable_hash(chunk index) mod
    n_shards`` — the 32-bit mixer from ``operators/sketches`` (engine-
    portable, so the assignment replays in SQL). Decorrelating the shard
    from the chunk's RESIDUE CLASS breaks exactly the periodic-stream
    adversary above: which chunks are heavy is still attacker-controlled,
    but which SHARD a heavy chunk lands on is now a fixed pseudo-random
    function of its index, so per-shard token mass concentrates like a
    random multinomial split (spread ~ sqrt(chunks), not linear). The
    trade: chunk counts per shard are multinomial too — the round-robin
    ±1 count guarantee is given up, and an adversary who knows the mixer
    could in principle re-align (use a keyed/salted hash off this path if
    the stream is genuinely hostile, at the cost of SQL replay)."""
    if shard_key == "pack":
        return packed.withColumn(
            "shard_id", (F.col(pack_col) % n_shards).cast("bigint")
        )
    if shard_key == "hash":
        from python_async_sample_spark.operators.sketches import portable_hash

        return packed.withColumn(
            "shard_id",
            (portable_hash(F.col(pack_col), 0) % n_shards).cast("bigint"),
        )
    raise ValueError(f"shard_key must be 'pack' or 'hash', got {shard_key!r}")
