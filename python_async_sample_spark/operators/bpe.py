"""Distributed BPE (byte-pair-encoding) merge learning.

Beyond the reference's inventory: tokenizer training is the first stage of
every LLM data pipeline, and its core loop — count adjacent symbol pairs
over the corpus, merge the most frequent pair, repeat — is exactly the
aggregate-then-rewrite shape a distributed engine is good at:

* PAIR COUNTING is one explode + one map-side-combinable groupBy per
  iteration; the candidate relation is vocabulary²-bounded, the corpus is
  scanned from its materialized symbol-array form;
* the ARGMAX pair is a distributed take-ordered of ONE row (deterministic
  tie-break: count desc, then pair lexicographic) — the only driver touch
  per iteration;
* the MERGE is applied corpus-side with a pure JVM ``aggregate`` fold over
  each document's symbol array (left-to-right, non-overlapping — the
  standard BPE application order), then the corpus is re-materialized for
  the next iteration (lineage cut, same contract as k-means/connected
  components).

Learned merges match the sequential reference algorithm exactly because
argmax + tie-break is deterministic and merge application is order-defined;
tests/test_bpe.py pins this against a pure-Python implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def to_symbols(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, syms) where syms is the whitespace-token sequence — the word-
    level starting alphabet (character-level slots in by exploding chars
    instead; the loop is alphabet-agnostic)."""
    return df.select(
        F.col(id_col).alias("doc"), F.split(F.col(text_col), " ").alias("syms")
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1), (x, i) -> struct(x as a, syms[i + 1] as b))"
    )
    return (
        symbols.where(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _apply_merge(symbols: DataFrame, a: str, b: str, joined: str) -> DataFrame:
    """Left-to-right non-overlapping merge of adjacent (a, b) inside each
    symbol array — a pure JVM fold, no Python, no shuffle."""
    merged = F.expr(
        """
        aggregate(
          syms,
          cast(array() as array<string>),
          (acc, x) ->
            if(size(acc) > 0 AND element_at(acc, -1) = {a} AND x = {b},
               concat(slice(acc, 1, size(acc) - 1), array({j})),
               concat(acc, array(x)))
        )
        """.format(a=_lit(a), b=_lit(b), j=_lit(joined))
    )
    return symbols.select("doc", merged.alias("syms"))


def _lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def learn_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int,
    min_count: int = 2,
    sep: str = "\x1e",
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over the corpus; returns
    [(left, right, pair_count), ...] in learned order. Stops early when no
    pair reaches ``min_count``. Each iteration costs one corpus scan + one
    pair-keyed shuffle + a one-row argmax; merged symbols join with
    ``sep`` so multi-way merges stay unambiguous."""
    symbols = to_symbols(df, id_col, text_col)
    # the per-iteration fold rewrites EVERY document — a small source (one
    # parquet file -> one partition) would serialize that work, so fan out
    # once before the loop; a real corpus scan already has more splits
    # than cores and skips this
    par = df.sparkSession.sparkContext.defaultParallelism
    if symbols.rdd.getNumPartitions() < par:
        symbols = symbols.repartition(par)
    symbols = symbols.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(symbols)
            .orderBy(F.col("c").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_count:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        merges.append((a, b, c))
        # lazy checkpoint: the next iteration's pair-count job materializes
        # the rewritten corpus as a side effect — one job per iteration
        # instead of two
        symbols = _apply_merge(symbols, a, b, a + sep + b).localCheckpoint(eager=False)
    return merges


def segment_with_merges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str, int]],
    sep: str = "\x1e",
) -> DataFrame:
    """Apply a learned merge list to a corpus (tokenize-with-vocab); returns
    (doc, syms, n_syms). Same fold kernel, replayed in learned order."""
    symbols = to_symbols(df, id_col, text_col)
    for a, b, _ in merges:
        symbols = _apply_merge(symbols, a, b, a + sep + b)
    return symbols.select("doc", "syms", F.size("syms").cast("bigint").alias("n_syms"))
