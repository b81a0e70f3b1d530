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

from python_async_sample_spark.operators.text import fan_out_small


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
    return_corpus: bool = False,
):
    """Learn ``n_merges`` BPE merges over the corpus; returns
    [(left, right, pair_count), ...] in learned order. Stops early when no
    pair reaches ``min_count``. Each iteration costs one corpus scan + one
    pair-keyed shuffle + a one-row argmax; merged symbols join with
    ``sep`` so multi-way merges stay unambiguous.

    ``return_corpus=True`` returns ``(merges, symbols_df)`` where the
    (doc, syms) relation already has every learned merge applied — the
    training loop rewrites the corpus each iteration anyway, so an
    encode-after-train caller gets its tokenized corpus for FREE instead
    of replaying ``n_merges`` folds over the raw text (halved q179)."""
    symbols = to_symbols(df, id_col, text_col)
    # the per-iteration fold rewrites EVERY document — a small source (one
    # parquet file -> one partition) would serialize that work, so fan out
    # once before the loop; a real corpus scan already has more splits
    # than cores and skips this
    symbols = fan_out_small(symbols).localCheckpoint(eager=True)
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
    if return_corpus:
        return merges, symbols
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


def bpe_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    n_merges: int,
    min_count: int = 2,
) -> str:
    """Chained-CTE DuckDB replay of :func:`learn_bpe` — certifies the whole
    training loop (pair counting, argmax tie-break, left-to-right
    non-overlapping merge application, early stop) on an independent
    engine, same oracle style as ``pagerank_oracle_sql``.

    The corpus rides as ONE STRING per document with doubled ``chr(31)``
    separators (``␟␟tok␟␟tok␟␟``), because plain ``replace()`` is exactly
    BPE's merge application — left-to-right, non-overlapping — *provided*
    adjacent matches don't share a boundary character: doubling the
    separator gives the pattern ``␟a␟␟b␟`` a private boundary ``␟`` on
    each side, so consecutive pairs (``x a b a b x``) merge exactly like
    the engine's fold and token-prefix false matches (``b`` vs ``bz``)
    are impossible.  Merged symbols join with ``chr(30)`` exactly like
    ``learn_bpe``'s ``sep``; both control characters are absent from the
    corpus by the same contract the engine relies on.  An iteration whose
    best pair falls below ``min_count`` contributes no merge row and
    leaves the corpus unchanged, so the early stop cascades.
    """
    parts = _bpe_chain_sql(table, id_col, text_col, n_merges, min_count)
    m = "chr(30)"
    ranked = "\nUNION ALL\n".join(
        f"SELECT {i + 1} AS rank, a, b, c FROM top{i}" for i in range(n_merges)
    )
    return (
        ",\n".join(parts)
        + f""",
        merges AS ({ranked})
        SELECT CAST(rank AS INT) AS rank,
               replace(a, {m}, ' ') AS "left",
               replace(b, {m}, ' ') AS "right",
               CAST(c AS BIGINT) AS pair_count
        FROM merges ORDER BY rank"""
    )


def bpe_encode_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    n_merges: int,
    min_count: int = 2,
) -> str:
    """DuckDB replay of :func:`segment_with_merges` fed by a fresh
    :func:`learn_bpe` — the ENCODE path: after the training chain's final
    corpus state s{n}, each document's symbol count is read straight off
    its doubled-separator string (``len(split) - 2`` strips the two empty
    boundary slots), joined back to the source for the whitespace-token
    baseline. Certifies that applying the learned merges left-to-right
    compresses every document identically on an independent engine."""
    s2 = "chr(31)"
    parts = _bpe_chain_sql(table, id_col, text_col, n_merges, min_count)
    return (
        ",\n".join(parts)
        + f"""
        SELECT s.doc AS doc_id,
               CAST(len(string_split(d.{text_col}, ' ')) AS BIGINT) AS n_ws_tokens,
               CAST(len(string_split(s.seq, {s2} || {s2})) - 2 AS BIGINT)
                 AS n_bpe_symbols,
               CAST(len(string_split(d.{text_col}, ' '))
                    - (len(string_split(s.seq, {s2} || {s2})) - 2) AS BIGINT)
                 AS merged_away
        FROM s{n_merges} s JOIN {table} d ON s.doc = d.{id_col}
        ORDER BY doc_id"""
    )


def _bpe_chain_sql(
    table: str, id_col: str, text_col: str, n_merges: int, min_count: int
) -> list[str]:
    """The shared chained-CTE training replay: returns the WITH components
    s0..s{n}, pc{i}, top{i} (all MATERIALIZED — DuckDB inlines plain CTEs
    per reference, which made the chain exponential)."""
    s2, m = "chr(31)", "chr(30)"  # doubled separator char, merge joiner
    parts = [
        f"""WITH s0 AS MATERIALIZED (
          SELECT {id_col} AS doc,
                 {s2} || {s2} ||
                 array_to_string(string_split({text_col}, ' '), {s2} || {s2})
                 || {s2} || {s2} AS seq
          FROM {table}
        )"""
    ]
    for i in range(n_merges):
        parts.append(
            f"""pc{i} AS MATERIALIZED (
              SELECT pr[1] AS a, pr[2] AS b, count(*) AS c FROM (
                SELECT unnest(list_zip(t[1:len(t) - 1], t[2:len(t)])) AS pr
                FROM (
                  SELECT arr[2:len(arr) - 1] AS t
                  FROM (SELECT string_split(seq, {s2} || {s2}) AS arr FROM s{i})
                ) WHERE len(t) >= 2
              ) GROUP BY 1, 2 HAVING count(*) >= {min_count}
            )"""
        )
        parts.append(
            f"top{i} AS MATERIALIZED (SELECT a, b, c FROM pc{i} ORDER BY c DESC, a, b LIMIT 1)"
        )
        parts.append(
            f"""s{i + 1} AS MATERIALIZED (
              SELECT doc, coalesce(
                replace(seq,
                        {s2} || t.a || {s2} || {s2} || t.b || {s2},
                        {s2} || t.a || {m} || t.b || {s2}),
                seq) AS seq
              FROM s{i} LEFT JOIN top{i} t ON TRUE
            )"""
        )
    return parts
