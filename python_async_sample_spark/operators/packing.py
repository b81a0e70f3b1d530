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
from pyspark.sql.types import LongType, StructField, StructType
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


def _pack_bins(lens, budget: int, best_fit: bool):
    """Sequential bin assignment over items IN THE GIVEN ORDER.

    ``best_fit``: each item goes to the open bin with the SMALLEST remaining
    capacity that still fits it (ties -> lowest bin index, numpy argmin's
    first-occurrence rule); no fit opens a new bin.  ``best_fit=False`` is
    the next-fit baseline: only the most recently opened bin is ever
    considered.  Returns 1-based bin indices (bins numbered in creation
    order).  Raises on any item that can never fit (len <= 0 or > budget) —
    loud, never silent truncation.
    """
    import numpy as np

    lens = np.asarray(lens, dtype=np.int64)
    if len(lens) and (lens.min() <= 0 or lens.max() > budget):
        bad = lens[(lens <= 0) | (lens > budget)][:5]
        raise ValueError(
            f"item lengths must be in [1, budget={budget}]; got {bad.tolist()} "
            "— chunk documents to the budget before packing"
        )
    rem = np.empty(len(lens), dtype=np.int64)  # remaining capacity per bin
    n_bins = 0
    out = np.empty(len(lens), dtype=np.int64)
    for i, need in enumerate(lens):
        if best_fit:
            fits = np.flatnonzero(rem[:n_bins] >= need)
            if fits.size:
                j = fits[np.argmin(rem[fits])]
                rem[j] -= need
                out[i] = j + 1
                continue
        elif n_bins and rem[n_bins - 1] >= need:
            rem[n_bins - 1] -= need
            out[i] = n_bins
            continue
        rem[n_bins] = budget - need
        n_bins += 1
        out[i] = n_bins
    return out


def _pack_grouped(
    items: DataFrame,
    shard_col: str,
    len_col: str,
    order_cols: list[str],
    budget: int,
    *,
    decreasing: bool,
    best_fit: bool,
) -> DataFrame:
    import pandas as pd

    schema = StructType(items.schema.fields + [StructField("bin", LongType())])
    sort_cols = ([len_col] if decreasing else []) + order_cols
    ascending = ([False] if decreasing else []) + [True] * len(order_cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        pdf["bin"] = _pack_bins(pdf[len_col].to_numpy(), budget, best_fit)
        return pdf

    return items.groupBy(shard_col).applyInPandas(pack, schema)


def best_fit_pack(
    items: DataFrame,
    shard_col: str,
    len_col: str,
    order_cols: list[str],
    budget: int,
) -> DataFrame:
    """Best-fit-decreasing packing of variable-length items into fixed
    ``budget``-token windows, per shard — the padding-minimizing policy
    production training pipelines use when documents must NOT span window
    boundaries (the no-split complement of :func:`pack_sequences`'
    concat-and-chunk; Muennighoff et al.'s data-constrained setting is the
    same accounting q234's mixing feeds).

    Within each shard, items are ordered by (``len_col`` DESC,
    ``*order_cols`` ASC) and each goes to the open bin with the smallest
    remaining capacity that fits (ties -> lowest bin index); no fit opens
    a new bin.  The assignment is a deterministic integer-exact function
    of the shard's contents, so a SQL engine can replay it step by step
    (see the q235 oracle's recursive CTE).

    Scale shape: the SHARD is the unit of parallelism (one Arrow batch per
    shard through applyInPandas) — exactly how production packers run, one
    sequential pass per output shard.  Per-shard cost is O(items x bins)
    with a numpy min-scan; shards are sized by the sharder (hash-mod, see
    :func:`assign_shards`), so no shard ever approaches driver or executor
    memory.  Adds ``bin`` (1-based, creation order).  Items longer than
    the budget raise loudly — chunk first (the standard pipeline order).
    """
    return _pack_grouped(
        items, shard_col, len_col, order_cols, budget,
        decreasing=True, best_fit=True,
    )


def next_fit_pack(
    items: DataFrame,
    shard_col: str,
    len_col: str,
    order_cols: list[str],
    budget: int,
) -> DataFrame:
    """Next-fit packing in arrival (``order_cols``) order: only the most
    recently opened bin is ever considered.  The naive streaming baseline
    best_fit_pack is measured against (tests assert BFD's padding waste <=
    next-fit's on the documents corpus at three scales)."""
    return _pack_grouped(
        items, shard_col, len_col, order_cols, budget,
        decreasing=False, best_fit=False,
    )
