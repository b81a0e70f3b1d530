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
) -> DataFrame:
    """Assign each packed document to one of ``n_shards`` output shards.

    Precondition: documents are pre-chunked to at most the packing budget
    (the standard pipeline order — chunk, pack, shard). The HARD guarantee
    is structural: chunk COUNTS per shard differ by at most one (round-robin
    over the chunk index), each chunk carries under two budgets of starting
    mass, and a document always follows its first token's chunk so it is
    never split across shards — no second pass, no driver-side greedy
    bin-packing, no shuffle beyond the write's own partitioning. Token-sum
    balance is STATISTICAL, not worst-case: chunk masses concentrate near
    one budget for real corpora, but a periodic adversarial stream (e.g.
    doc sizes 15,16,1 repeating against budget 16 and 2 shards) aligns
    heavy chunks with one residue class and skews token sums linearly in
    stream length. Callers needing a worst-case token bound should shard
    on a decorrelated key (hash of content) at the cost of determinism
    under re-packing."""
    return packed.withColumn(
        "shard_id", (F.col(pack_col) % n_shards).cast("bigint")
    )
