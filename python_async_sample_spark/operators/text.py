"""Text-analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting.

All pure built-in expressions (split/regexp/aggregate/md5) so they run
JVM-side with codegen and are portable to the SQL oracle. A 100 TB corpus
pays one scan per query, no shuffle except final aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword sets for the lang-ID heuristic.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def tokens_col(text_col: str) -> F.Column:
    return F.split(F.col(text_col), " ")


def fan_out_small(df: DataFrame) -> DataFrame:
    """Fan a small relation out to ``defaultParallelism`` before CPU-heavy
    per-row work (explode/shingle/aggregate chains): a single-split scan
    otherwise serializes a whole corpus pass in ONE task (guide §2.5 —
    measured 2-4 s single-task stages at sf0.1). A real warehouse scan has
    more splits than cores and returns unchanged. This is THE shared guard
    (round-10 verdict item 2): dedup.shingle_index, substring_dedup, BPE,
    decontaminate and the plan-level callers all import it — do not copy
    the getNumPartitions/repartition pattern inline again."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, char count, avg token length, distinct-token ratio,
    stopword ratio — the length/punct/stopword quality features."""
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tokens
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS["en"]])))
    return (
        df.withColumn("n_tokens", n_tokens.cast("bigint"))
        .withColumn("n_chars_m", F.length(text_col).cast("bigint"))
        .withColumn("avg_token_len", (F.length(text_col) - n_tokens + 1) / n_tokens)
        .withColumn("distinct_ratio", distinct_ratio)
        .withColumn("has_stopword", stop_hits > 0)
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0–1 quality score from the stats (deterministic arithmetic,
    no model): length factor × diversity factor."""
    stats = with_text_stats(df, text_col)
    length_factor = F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0))
    return stats.withColumn("quality", length_factor * F.col("distinct_ratio"))


def detect_lang(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword language heuristic: count hits per language's
    stopword set, pick the argmax if ≥1 hits else 'und' (undetermined).
    Ties broken by language code order for determinism."""
    toks = tokens_col(text_col)
    hit_cols = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in STOPWORDS.items()
    }
    # argmax with deterministic tiebreak (ordered comparison chain)
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in sorted(STOPWORDS):  # later langs win only on strictly more hits
        cond = hit_cols[lang] > best_hits
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, hit_cols[lang]).otherwise(best_hits)
    return df.withColumn("detected_lang", best_lang)


# "BPE-ish" tokenizer regex: letter runs, digit runs, or any single
# non-space symbol — the pre-tokenization split most BPE vocabularies use.
BPE_ISH = r"[A-Za-z]+|[0-9]+|\S"


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count, both built-in
    (codegen'd regexp on the JVM — one corpus scan, no shuffle)."""
    return df.withColumn(
        "n_ws_tokens", F.size(F.split(F.col(text_col), " ")).cast("bigint")
    ).withColumn(
        "n_re_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), 0)).cast("bigint"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two deterministic fingerprints:

    * ``fp_content`` — md5 of the raw text (exact-dup key);
    * ``fp_bag`` — md5 of the sorted distinct token bag (order-insensitive
      near-dup key: word-shuffled copies collide).
    """
    toks = tokens_col(text_col)
    bag = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return df.withColumn("fp_content", F.md5(F.col(text_col))).withColumn(
        "fp_bag", F.md5(bag)
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document for a bag-of-terms query.

    SHUFFLE-FREE for a fixed small term set (a search query, not a
    vocabulary): per-doc term frequencies are ``size(filter(tokens, ==
    term))`` expressions — no explode, no tf/df groupBys — so the whole
    thing is ONE stats action (N, avgdl, per-term document frequency in a
    single global aggregate) plus ONE narrow scan emitting (id, score)
    rows.  The r5 shape exploded tokens through two keyed shuffles and
    probed N/avgdl in two more actions; at 100 TB that was four scans of
    the corpus where two suffice (VERDICT r5 item 5's explain pass).
    Documents matching no term are absent (score 0).  IDF stays a Spark
    expression (same libm as before) with the driver-scalar stats as
    literals — the oracle's arithmetic is unchanged.  ``terms`` is
    deduplicated at entry (order-preserving): classic BM25 scores each
    DISTINCT query term once, and the pre-rewrite shape's isin+groupBy
    collapsed duplicates implicitly — per-occurrence weighting would
    silently double a repeated term's contribution."""
    terms = list(dict.fromkeys(terms))
    toks = tokens_col(text_col)

    def _is(term: str):
        # one-arg lambda via closure: a defaulted second parameter would
        # make F.filter pass the ELEMENT INDEX as the captured value
        return lambda t: t == F.lit(term)

    base = df.select(
        F.col(id_col),
        F.size(toks).cast("double").alias("dl"),
        *[
            F.size(F.filter(toks, _is(term))).cast("double").alias(f"__tf{i}")
            for i, term in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("double")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    ).first()
    n_docs, avgdl = stats["n"], stats["avgdl"]

    def contrib(i: int) -> F.Column:
        tf = F.col(f"__tf{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.lit(n_docs) - F.lit(stats[f"__df{i}"]) + 0.5)
            / (F.lit(stats[f"__df{i}"]) + 0.5)
        )
        denom = tf + k1 * (1 - b + b * F.col("dl") / F.lit(float(avgdl)))
        return F.when(tf > 0, idf * (tf * (k1 + 1)) / denom).otherwise(F.lit(0.0))

    score = sum((contrib(i) for i in range(len(terms))), F.lit(0.0))
    return (
        base.where(
            sum((F.col(f"__tf{i}") for i in range(len(terms))), F.lit(0.0)) > 0
        )
        .select(F.col(id_col), score.alias("score"))
    )


# PII-shaped patterns in the regex subset Java and RE2 interpret alike.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone": r"[0-9]{3}-[0-9]{3}-[0-9]{4}",
}


def redact_pii(
    df: DataFrame, text_col: str = "text", patterns: dict[str, str] | None = None
) -> DataFrame:
    """Scrub PII-shaped spans, keeping an audit count per pattern.

    Order matters (ssn before phone: both are digit-dash shapes); each
    pattern is replaced by ``[<NAME>]``. Adds ``redacted`` plus one
    ``n_<name>`` count per pattern — one scan, all JVM-side regex."""
    patterns = patterns if patterns is not None else PII_PATTERNS
    out = df
    red = F.col(text_col)
    for name, pat in patterns.items():
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(red, F.lit(pat), 0)).cast("bigint"),
        )
        red = F.regexp_replace(red, pat, f"[{name.upper()}]")
    return out.withColumn("redacted", red)


def repetition_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document.

    Emits (id, n_words, distinct_frac, top_bigram_frac): heavily repeated
    text — the classic low-quality web-scrape signature — shows a low
    distinct-token fraction and a dominant bigram. All built-in
    expressions: one explode per signal, aggregations map-side combinable;
    documents with fewer than two tokens carry no bigram and are dropped
    (nothing to score).
    """
    df = fan_out_small(df)  # two whole-corpus explode passes below
    words = F.split(F.col(text_col), " ")
    toks = df.select(F.col(id_col).alias("doc"), F.explode(words).alias("tok"))
    wstats = toks.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.countDistinct("tok").alias("n_distinct"),
    )
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(words) - 2),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, 2)),
    )
    bg = (
        df.where(F.size(words) >= 2)
        .select(F.col(id_col).alias("doc"), F.explode(bigrams).alias("bg"))
        .groupBy("doc", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bstats = bg.groupBy("doc").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_bg")
    )
    return (
        wstats.join(bstats, "doc")
        .select(
            F.col("doc").alias(id_col),
            "n_words",
            (F.col("n_distinct") / F.col("n_words")).alias("distinct_frac"),
            (F.col("top_c") / F.col("n_bg")).alias("top_bigram_frac"),
        )
    )


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text normalization: lowercase, strip everything outside
    [a-z0-9 ], collapse whitespace runs, trim. Adds ``norm_text``. The
    regex subset is interpreted identically by Java and every other
    engine's regex — the cross-engine contract PII redaction also relies
    on."""
    norm = F.lower(F.col(text_col))
    norm = F.regexp_replace(norm, r"[^a-z0-9 ]", "")
    norm = F.trim(F.regexp_replace(norm, r" +", " "))
    return df.withColumn("norm_text", norm)


def cooccurrence_pmi(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50,
    min_pair_docs: int = 5,
) -> DataFrame:
    """Document-level co-occurrence PMI over a bounded vocabulary.

    PMI(a,b) = ln(P(a,b) / (P(a)P(b))) with document-frequency estimates:
    P(a) = docs containing a / N. The vocabulary is capped at the
    ``vocab_size`` most document-frequent tokens (ties broken by token) —
    the boundedness is the scale argument: per-doc pair explosion is
    <= vocab_size^2/2 regardless of corpus size, and the vocab relation is
    legitimately broadcastable BECAUSE it is capped (contrast the full
    token vocabulary, which is data-sized and must never be broadcast).

    One scan -> distinct (doc, tok); one agg for document frequencies; a
    doc-keyed self-join for pairs (shuffle on doc id); one agg on the pair
    key. Returns (tok_a, tok_b, n_docs_pair, pmi) for pairs seen in at
    least ``min_pair_docs`` documents.
    """
    from pyspark.sql.window import Window as W

    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    ).where(F.length("tok") > 0)

    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    vocab = (
        dfreq.withColumn(
            "__rk",
            F.row_number().over(W.orderBy(F.col("df").desc(), F.col("tok"))),
        )
        .where(F.col("__rk") <= vocab_size)
        .drop("__rk")
    )

    vtoks = toks.join(F.broadcast(vocab.select("tok")), "tok")
    n_docs = df.select(F.count(F.lit(1)).cast("double").alias("__n"))

    a = vtoks.select(F.col("doc"), F.col("tok").alias("tok_a"))
    b = vtoks.select(F.col("doc"), F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, "doc")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs_pair"))
        .where(F.col("n_docs_pair") >= min_pair_docs)
    )
    return (
        pairs.join(
            F.broadcast(vocab.select(F.col("tok").alias("tok_a"), F.col("df").alias("__dfa"))),
            "tok_a",
        )
        .join(
            F.broadcast(vocab.select(F.col("tok").alias("tok_b"), F.col("df").alias("__dfb"))),
            "tok_b",
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "n_docs_pair",
            F.round(
                F.log(
                    F.col("n_docs_pair") * F.col("__n") / (F.col("__dfa") * F.col("__dfb"))
                ),
                4,
            ).alias("pmi"),
        )
    )


def shingle_boilerplate_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    n: int = 5,
    df_num: int = 3,
    df_den: int = 10,
) -> DataFrame:
    """Template/boilerplate removal, the CCNet/RefinedWeb line-dedup idea
    re-expressed for token streams: a token ``n``-gram occurring in at
    least ``df_num/df_den`` of a group's documents (same site/source
    emitting the same navigation header, cookie banner, footer on every
    page) is boilerplate; every token covered by any occurrence of a
    boilerplate shingle is dropped, the survivors rejoin in order.

    Returns (id, n_tokens, n_removed, clean_text) — one row per input doc,
    fully-boilerplate docs included with ``clean_text = ''``.

    The document-frequency threshold compares integers
    (``df_docs * df_den >= df_num * n_docs``) so the cut is exact on any
    engine.  Scale shape: one shingle explode (≈ tokens rows), one
    (group, shingle) groupBy with map-side partial countDistinct, one
    equi-join of shingle occurrences against the detected set (shuffle
    join — the boilerplate relation is data-dependent, never forced
    broadcast), one anti-join on covered positions, one per-doc
    reassembly groupBy.  Nothing is quadratic; no driver collects."""
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__grp"),
        F.split(F.col(text_col), " ").alias("__toks"),
    ).withColumn("__n_tokens", F.size("__toks"))

    starts = base.where(F.col("__n_tokens") >= n).select(
        "__id",
        "__grp",
        F.explode(F.sequence(F.lit(1), F.col("__n_tokens") - (n - 1))).alias("__i"),
        "__toks",
    ).select(
        "__id", "__grp", "__i",
        F.concat_ws(" ", F.slice("__toks", F.col("__i"), n)).alias("__sh"),
    )
    n_docs = base.groupBy("__grp").agg(F.countDistinct("__id").alias("__n_docs"))
    boiler = (
        starts.groupBy("__grp", "__sh")
        .agg(F.countDistinct("__id").alias("__df_docs"))
        .join(n_docs, "__grp")
        .where(F.col("__df_docs") * df_den >= df_num * F.col("__n_docs"))
        .select("__grp", "__sh")
    )
    covered = (
        starts.join(boiler, ["__grp", "__sh"])
        .select(
            "__id",
            F.explode(F.sequence(F.col("__i"), F.col("__i") + (n - 1))).alias("__pos"),
        )
        .distinct()
    )
    tok_rows = base.select(
        "__id", "__n_tokens", F.posexplode("__toks").alias("__p0", "__tok")
    ).select("__id", "__n_tokens", (F.col("__p0") + 1).alias("__pos"), "__tok")
    kept = tok_rows.join(covered, ["__id", "__pos"], "left_anti")
    reassembled = kept.groupBy("__id").agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__tok"))),
                lambda s: s["__tok"],
            ),
        ).alias("clean_text"),
    )
    return (
        base.select("__id", "__n_tokens")
        .join(reassembled, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("__n_tokens").cast("bigint").alias("n_tokens"),
            (F.col("__n_tokens") - F.coalesce(F.col("__n_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )
