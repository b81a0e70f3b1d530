"""Document chunking — split long documents into bounded-size overlapping
windows, the step BEFORE sequence packing in a training pipeline
(chunk → pack → shard; see ``operators/packing``).

Token-level chunking over whitespace tokens: a document of n tokens with
``chunk_tokens=C`` and ``overlap=V`` yields ceil((n - V) / (C - V)) chunks
whose starts step by C - V; the last chunk is short rather than padded.
Everything is built-in expressions — ``sequence`` generates chunk starts
per document (rows ∝ chunks, never tokens²), ``slice`` + ``array_join``
re-materialize the chunk text. One scan, one explode sized by output.

At 100 TB this runs as a row-local map — no shuffle at all; the downstream
packer is the first shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Explode each document into (id, chunk_no, n_chunk_tokens, chunk)
    rows. ``overlap`` tokens are shared between consecutive chunks so no
    span longer than C - V is ever cut without context."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # starts: 1, 1+step, 1+2·step, … while start <= max(n - overlap, 1)
    starts = F.sequence(F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(step))
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_no", "__start"),
        )
        .select(
            id_col,
            F.col("chunk_no").cast("bigint").alias("chunk_no"),
            F.least(
                F.lit(chunk_tokens), F.size("__toks") - F.col("__start") + 1
            ).cast("bigint").alias("n_chunk_tokens"),
            F.array_join(
                F.slice("__toks", F.col("__start"), F.lit(chunk_tokens)), " "
            ).alias("chunk"),
        )
    )
