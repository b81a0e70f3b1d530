"""Text-analysis queries over the documents table (driver gate).

Every query here is pure built-in-expression Spark (one scan, no Python in
the hot path) with an exact DuckDB oracle: token/char statistics, quality
scoring, stopword language-ID, token counting (whitespace + BPE-ish regex),
and document fingerprinting. Computed doubles are rounded identically on
both sides (engine summation/division ulp differences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_async_sample_spark.operators.text import (
    STOPWORDS,
    detect_lang,
    fan_out_small,
    fingerprint,
    normalize_text,
    quality_score,
    repetition_stats,
    with_text_stats,
    with_token_counts,
)
from python_async_sample_spark.operators.dedup import canopy_key
from python_async_sample_spark.plans.registry import query
from python_async_sample_spark.sources.readers import load_table


def _sql_list(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_EN = _sql_list(STOPWORDS["en"])


@query(
    "q40_text_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_m,
           round((length(text) - len(toks) + 1) * 1.0 / len(toks), 4) AS avg_token_len,
           round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS distinct_ratio,
           len(list_intersect(toks, {_EN})) > 0 AS has_stopword
    FROM t ORDER BY doc_id
    """,
    ref="text-quality-stats",
    tags=("llm-data", "text"),
)
def q40_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/diversity/stopword quality features — one scan, codegen only."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        with_text_stats(docs)
        .select(
            "doc_id",
            "n_tokens",
            "n_chars_m",
            F.round("avg_token_len", 4).alias("avg_token_len"),
            F.round("distinct_ratio", 4).alias("distinct_ratio"),
            "has_stopword",
        )
        .orderBy("doc_id")
    )


@query(
    "q41_quality_score",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           round(least(len(toks) / 50.0, 1.0)
                 * (len(list_distinct(toks)) * 1.0 / len(toks)), 4) AS quality
    FROM t ORDER BY doc_id
    """,
    ref="text-quality-score",
    tags=("llm-data", "text"),
)
def q41_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite 0-1 quality score: length factor x token diversity."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        quality_score(docs)
        .select("doc_id", F.round("quality", 4).alias("quality"))
        .orderBy("doc_id")
    )


def _langid_oracle() -> str:
    hits = ",\n           ".join(
        f"len(list_intersect(toks, {_sql_list(ws)})) AS h_{lang}"
        for lang, ws in STOPWORDS.items()
    )
    langs = sorted(STOPWORDS)
    gmax = "greatest(" + ", ".join(f"h_{l}" for l in langs) + ")"
    case = f"CASE WHEN {gmax} = 0 THEN 'und' "
    # first language in sorted order reaching the max wins — same tie-break
    # as detect_lang's strictly-greater comparison chain
    for lang in langs:
        case += f"WHEN h_{lang} = {gmax} THEN '{lang}' "
    case += "END"
    return f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    h AS (SELECT doc_id, lang,
           {hits}
    FROM t)
    SELECT lang, {case} AS detected_lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM h GROUP BY 1, 2 ORDER BY 1, 2
    """


@query(
    "q42_language_id",
    oracle=_langid_oracle(),
    ref="text-langid",
    tags=("llm-data", "text"),
)
def q42_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit argmax language heuristic, confusion counts vs the
    labeled lang column."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        detect_lang(docs)
        .groupBy("lang", "detected_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "detected_lang")
    )


@query(
    "q43_fingerprints",
    oracle="""
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, md5(text) AS fp_content,
           md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp_bag
    FROM t ORDER BY doc_id
    """,
    ref="text-fingerprint",
    tags=("llm-data", "text"),
)
def q43_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content + token-bag fingerprints (near-dup keys)."""
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs).select("doc_id", "fp_content", "fp_bag").orderBy("doc_id")


@query(
    "q45_vocab_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT token, CAST(count(*) AS BIGINT) AS tf,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM tok WHERE token <> ''
    GROUP BY token ORDER BY tf DESC, token LIMIT 20
    """,
    ref="text-vocab-stats",
    tags=("llm-data", "text"),
)
def q45_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: term frequency and document frequency per token,
    top 20 — one explode + one groupBy, map-side combined; the profile a
    tokenizer/filter stage reads before processing a corpus."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(20)
    )


@query(
    "q44_token_counts",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|\\S')) AS BIGINT)
             AS n_re_tokens
    FROM documents ORDER BY doc_id
    """,
    ref="text-token-count",
    tags=("llm-data", "text"),
)
def q44_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish-regex token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        with_token_counts(docs)
        .select("doc_id", "n_ws_tokens", "n_re_tokens")
        .orderBy("doc_id")
    )


@query(
    "q79_repetition_quality",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    words AS (SELECT doc_id, unnest(w) AS tok FROM toks),
    wstats AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             count(DISTINCT tok) AS n_distinct
      FROM words GROUP BY 1
    ),
    big AS (
      SELECT doc_id, w[g.i] || ' ' || w[g.i+1] AS bg
      FROM toks CROSS JOIN unnest(generate_series(1, len(w) - 1)) AS g(i)
      WHERE len(w) >= 2
    ),
    bgc AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY 1, 2),
    bstats AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_bg FROM bgc GROUP BY 1)
    SELECT w.doc_id, n_words,
           round(n_distinct * 1.0 / n_words, 4) AS distinct_frac,
           round(top_c * 1.0 / n_bg, 4) AS top_bigram_frac
    FROM wstats w JOIN bstats USING (doc_id) ORDER BY doc_id
    """,
    ref="text-repetition-quality (beyond reference)",
    tags=("llm-data", "text"),
)
def q79_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (distinct-token fraction, dominant
    bigram share) per document — the standard low-quality-scrape filter
    inputs, all built-in expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        repetition_stats(docs, "doc_id", "text")
        .select(
            "doc_id",
            "n_words",
            F.round("distinct_frac", 4).alias("distinct_frac"),
            F.round("top_bigram_frac", 4).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "q80_normalize_text",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
               ' +', ' ', 'g'))) AS norm_md5,
           CAST(len(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
               ' +', ' ', 'g'))) AS BIGINT) AS norm_len
    FROM documents ORDER BY doc_id
    """,
    ref="text-normalization (beyond reference)",
    tags=("llm-data", "text"),
)
def q80_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization (lowercase, charset strip, whitespace
    collapse) with md5 + length of the normalized text — the md5 makes the
    whole normalized string the cross-engine contract, not a sample."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        normalize_text(docs, "text")
        .select(
            "doc_id",
            F.md5("norm_text").alias("norm_md5"),
            F.length("norm_text").cast("bigint").alias("norm_len"),
        )
        .orderBy("doc_id")
    )


_UNIGRAM_ORACLE = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (SELECT tok, count(*) * 1.0 AS c FROM toks GROUP BY tok),
    total AS (SELECT sum(c) AS n FROM tf),
    scored AS (
      SELECT t.doc_id, ln(tf.c / total.n) AS lp
      FROM toks t JOIN tf USING (tok) CROSS JOIN total
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(lp) / count(*), 4) AS avg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@query(
    "q89_unigram_logprob",
    oracle=_UNIGRAM_ORACLE,
    ref="text-unigram-lm-scoring (beyond reference)",
    tags=("llm-data", "text"),
)
def q89_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    empirical distribution — the classic cheap LM quality/importance signal
    (gibberish and boilerplate both score away from the bulk).

    Scale posture: the vocabulary (term-frequency relation) is O(distinct
    tokens in the corpus) — billions of rows at 100 TB — so it is joined on
    ``tok`` as a SHUFFLE join (AQE picks the physical strategy and splits
    the Zipf-head skew via skew-join), never broadcast.  The exploded token
    relation is recomputed for each consumer rather than materialized: two
    scans of the source beat pinning O(corpus tokens) in executor storage.
    Only the single-row corpus total is broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("c"))
    total = tf.agg(F.sum("c").alias("n"))
    scored = toks.join(tf, "tok").crossJoin(F.broadcast(total))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum(F.log(F.col("c") / F.col("n"))) / F.count(F.lit(1)), 4).alias(
                "avg_logprob"
            ),
        )
        .orderBy("doc_id")
    )


_CLASSIFIER_ORACLE = """
    WITH feats AS (
      SELECT doc_id,
             length(string_split(text, ' ')) AS n_tokens,
             length(text) AS n_chars,
             length(list_distinct(string_split(text, ' ')))
               * 1.0 / length(string_split(text, ' ')) AS distinct_ratio
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             1.0 / (1.0 + exp(-(-2.0
                                + 0.015 * least(n_tokens, 400)
                                + 3.0  * distinct_ratio
                                - 0.002 * (n_chars * 1.0 / n_tokens)))) AS p
      FROM feats
    )
    SELECT doc_id, round(p, 6) AS p_keep,
           CAST(p >= 0.5 AS BOOLEAN) AS keep
    FROM scored ORDER BY doc_id
"""


@query(
    "q114_quality_classifier",
    oracle=_CLASSIFIER_ORACLE,
    ref="model-based quality filter (beyond reference; frozen linear classifier over text features)",
    tags=("llm-data", "text", "feature"),
)
def q114_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A frozen linear quality classifier (fastText-style logistic over
    cheap text features) applied as pure JVM expressions — the
    model-based keep/drop step of corpus prep. Weights are constants
    broadcast in the plan; scoring is one scan, no UDF, no shuffle before
    the gate's orderBy. Swapping in retrained weights is a literal
    change, the dataflow is identical."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    distinct_ratio = F.size(F.array_distinct(toks)) * F.lit(1.0) / n_tokens
    z = (
        F.lit(-2.0)
        + F.lit(0.015) * F.least(n_tokens, F.lit(400))
        + F.lit(3.0) * distinct_ratio
        - F.lit(0.002) * (n_chars * F.lit(1.0) / n_tokens)
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return docs.select(
        "doc_id",
        F.round(p, 6).alias("p_keep"),
        (p >= 0.5).alias("keep"),
    ).orderBy("doc_id")


_TFIDF_ORACLE = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE term <> '' GROUP BY 1, 2
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok WHERE term <> '' GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rk
      FROM scored
    )
    SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tfidf
    FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk
"""


@query(
    "q115_tfidf_keywords",
    oracle=_TFIDF_ORACLE,
    ref="per-document TF-IDF keyword extraction (beyond reference; cf. BM25 q46)",
    tags=("llm-data", "text"),
)
def q115_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the cheap keyword/topic signal a
    corpus browser or mixture-balancing stage reads. tf and df are two
    grouped aggregations over one exploded scan; df joins back on term as
    a SHUFFLE join (document frequency is vocabulary-sized — same
    never-broadcast rule as q89); the per-doc top-3 is a partitioned
    window, deterministic via the term tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    # corpus size rides the plan as a broadcast one-row scalar — no eager
    # driver-side count() action
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("__n") / F.col("df")), 6).alias("tfidf"),
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 3)
        .select("doc_id", "rk", "term", "tfidf")
        .orderBy("doc_id", "rk")
    )


_HEALTH_ORACLE = """
    WITH feats AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' ')))
               * 1.0 / len(string_split(text, ' ')) AS distinct_ratio,
             md5(substr(lower(text), 1, 40)) AS canopy
      FROM documents
    ),
    flagged AS (
      SELECT lang,
             CASE WHEN n_tokens < 20 THEN 'short'
                  WHEN distinct_ratio < 0.5 THEN 'repetitive'
                  ELSE 'ok' END AS quality_bucket,
             count(*) OVER (PARTITION BY canopy) > 1 AS is_dup,
             n_tokens
      FROM feats
    )
    SELECT coalesce(lang, '<all>') AS lang,
           coalesce(quality_bucket, '<all>') AS quality_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
    FROM flagged
    GROUP BY GROUPING SETS ((lang, quality_bucket), (lang), ())
    ORDER BY lang, quality_bucket
"""


@query(
    "q116_corpus_health_report",
    oracle=_HEALTH_ORACLE,
    ref="corpus health dashboard (beyond reference; grouping-sets composition of quality/dup/lang signals)",
    tags=("llm-data", "text", "rollup"),
)
def q116_corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-pass ops dashboard a corpus owner reads before a training
    run: per-(lang, quality-bucket) doc/token/duplicate counts with lang
    and grand-total rollups via GROUPING SETS — one scan computes the
    features, one window marks canopy duplicates, one multi-grain
    aggregation replaces three separate dashboard queries."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    feats = docs.select(
        "lang",
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) * F.lit(1.0) / F.size(toks)).alias(
            "distinct_ratio"
        ),
        canopy_key("text").alias("canopy"),
    )
    from pyspark.sql.window import Window as W

    flagged = feats.select(
        "lang",
        F.when(F.col("n_tokens") < 20, "short")
        .when(F.col("distinct_ratio") < 0.5, "repetitive")
        .otherwise("ok")
        .alias("quality_bucket"),
        (F.count(F.lit(1)).over(W.partitionBy("canopy")) > 1).alias("is_dup"),
        "n_tokens",
    )
    return (
        flagged.groupingSets(
            [["lang", "quality_bucket"], ["lang"], []], "lang", "quality_bucket"
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dup_docs"),
        )
        .select(
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            F.coalesce("quality_bucket", F.lit("<all>")).alias("quality_bucket"),
            "n_docs",
            "total_tokens",
            "n_dup_docs",
        )
        .orderBy("lang", "quality_bucket")
    )


_PMI_ORACLE = """
    WITH toks AS (
      SELECT DISTINCT doc_id AS doc, tok
      FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      ) WHERE len(tok) > 0
    ),
    dfreq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY tok
    ),
    vocab AS (
      SELECT tok, df FROM (
        SELECT tok, df,
               row_number() OVER (ORDER BY df DESC, tok) AS rk
        FROM dfreq
      ) WHERE rk <= 50
    ),
    vtoks AS (SELECT t.doc, t.tok FROM toks t JOIN vocab USING (tok)),
    n AS (SELECT count(*) * 1.0 AS n_docs FROM documents),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b,
             CAST(count(*) AS BIGINT) AS n_docs_pair
      FROM vtoks a JOIN vtoks b ON a.doc = b.doc AND a.tok < b.tok
      GROUP BY 1, 2 HAVING count(*) >= 5
    )
    SELECT p.tok_a, p.tok_b, p.n_docs_pair,
           round(ln(p.n_docs_pair * n.n_docs / (va.df * vb.df)), 4) AS pmi
    FROM pairs p
    JOIN vocab va ON p.tok_a = va.tok
    JOIN vocab vb ON p.tok_b = vb.tok
    CROSS JOIN n
    ORDER BY tok_a, tok_b
"""


@query(
    "q124_cooccurrence_pmi",
    oracle=_PMI_ORACLE,
    ref="token co-occurrence PMI (beyond reference; bounded-vocabulary association mining)",
    tags=("llm-data", "text"),
)
def q124_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between the corpus's 50 most
    document-frequent tokens, from document-level co-occurrence counts.
    The vocabulary cap is the scale contract: it bounds the per-doc pair
    explosion and makes the vocab relation legitimately broadcastable
    (a full token vocabulary is data-sized and never would be)."""
    from python_async_sample_spark.operators.text import cooccurrence_pmi

    docs = load_table(spark, sf_dir, "documents")
    return cooccurrence_pmi(docs, "doc_id", "text", vocab_size=50, min_pair_docs=5).orderBy(
        "tok_a", "tok_b"
    )


_BIGRAM_ORACLE = """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    big AS (
      SELECT doc_id, ws[g.i] AS a, ws[g.i+1] AS b
      FROM w CROSS JOIN unnest(generate_series(1, len(ws) - 1)) AS g(i)
    ),
    bc AS (SELECT a, b, count(*) * 1.0 AS cab FROM big GROUP BY 1, 2),
    uc AS (
      SELECT tok, count(*) * 1.0 AS ca
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY 1
    ),
    v AS (SELECT count(*) * 1.0 AS vsize FROM uc),
    scored AS (
      SELECT t.doc_id,
             ln((bc.cab + 0.5) / (uc.ca + 0.5 * v.vsize)) AS lp
      FROM big t
      JOIN bc ON t.a = bc.a AND t.b = bc.b
      JOIN uc ON t.a = uc.tok
      CROSS JOIN v
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(lp) / count(*), 4) AS avg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@query(
    "q125_bigram_logprob",
    oracle=_BIGRAM_ORACLE,
    ref="text-bigram-lm-scoring (beyond reference; conditional extension of q89's unigram signal)",
    tags=("llm-data", "text"),
)
def q125_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram log-probability with add-0.5 smoothing,
    P(b|a) = (c(a,b)+k) / (c(a)+k|V|) — the conditional refinement of
    q89's unigram signal (fluency, not just vocabulary burstiness).

    Same scale posture as q89: bigram and unigram count relations are
    vocabulary-sized (data-sized at 100 TB) so both ride SHUFFLE joins on
    their keys — never broadcast; AQE splits the Zipf head. Only the
    single-row vocab-size scalar is broadcast. The exploded bigram
    relation is recomputed per consumer rather than pinned."""
    docs = load_table(spark, sf_dir, "documents")
    # fan the corpus out BEFORE the explode-heavy token/bigram passes: a
    # single-split scan otherwise runs each whole-corpus Generate + partial
    # aggregation in one task (measured: the unigram chain alone was a 4.1 s
    # single-task job at sf0.1; guide §2.5) — a real 100 TB scan has more
    # splits than cores and skips this
    docs = fan_out_small(docs)
    ws = F.split("text", " ")
    grams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.struct(
                F.element_at(ws, i + 1).alias("a"), F.element_at(ws, i + 2).alias("b")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    big = docs.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", F.col("g.a").alias("a"), F.col("g.b").alias("b")
    )
    # two consumers (count build + final scoring join): materialize the
    # exploded relation once instead of re-exploding per consumer — the
    # positional-index contract from dedup.shingle_index
    big = big.localCheckpoint(eager=True)
    bc = big.groupBy("a", "b").agg(F.count(F.lit(1)).cast("double").alias("cab"))
    # two consumers here too: the vsize scalar's broadcast build would
    # otherwise RE-RUN the whole unigram explode+aggregate lineage — pin the
    # vocabulary-sized relation once (guide §5 caching: reused AND expensive)
    uc = (
        docs.select(F.explode(ws).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("double").alias("ca"))
        .localCheckpoint(eager=True)
    )
    v = uc.agg(F.count(F.lit(1)).cast("double").alias("vsize"))
    # fold the model down to one lp per DISTINCT bigram first (vocab-sized
    # relations joining each other), so the corpus-sized exploded relation
    # rides exactly ONE shuffle join instead of two
    model = (
        bc.join(uc.select(F.col("tok").alias("a"), "ca"), "a")
        .crossJoin(F.broadcast(v))
        .select(
            "a",
            "b",
            F.log((F.col("cab") + 0.5) / (F.col("ca") + 0.5 * F.col("vsize"))).alias("lp"),
        )
    )
    return (
        big.join(model, ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("lp") / F.count(F.lit(1)), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


_ENTROPY_ORACLE = """
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (
      SELECT source, tok, count(*) * 1.0 AS c FROM toks GROUP BY 1, 2
    ),
    tot AS (SELECT source, sum(c) AS n FROM tf GROUP BY 1)
    SELECT tf.source,
           CAST(tot.n AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           round(-sum((tf.c / tot.n) * ln(tf.c / tot.n)), 4) AS entropy
    FROM tf JOIN tot USING (source)
    GROUP BY tf.source, tot.n ORDER BY tf.source
"""


@query(
    "q140_source_entropy",
    oracle=_ENTROPY_ORACLE,
    ref="corpus diversity report (beyond reference; Shannon entropy of the per-source token distribution)",
    tags=("llm-data", "text"),
)
def q140_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's token distribution — the diversity
    screen that catches template farms (low entropy at normal size) before
    they flood a training mixture. Two map-side-combinable aggregations
    over one exploded scan; per-source term frequencies stay key-partitioned
    (vocabulary-sized — never broadcast, never collected)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).cast("double").alias("c"))
    tot = tf.groupBy("source").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        tf.join(tot, "source")
        .groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy"),
        )
        .select(
            "source", F.col("n").cast("bigint").alias("n_tokens"), "vocab", "entropy"
        )
        .orderBy("source")
    )


from python_async_sample_spark.operators.bpe import bpe_oracle_sql as _bpe_oracle


@query(
    "q141_bpe_merges",
    # oracled since r4 (VERDICT r3 item 8): a chained-CTE DuckDB replay of
    # the full training loop — doubled-separator string encoding makes
    # plain replace() exactly BPE's left-to-right non-overlapping merge;
    # the sequential pure-Python pin in tests/test_bpe.py remains as the
    # third, engine-free implementation
    oracle=_bpe_oracle("documents", "doc_id", "text", n_merges=12),
    ref="distributed BPE tokenizer training (beyond reference; the first stage of every LLM data pipeline)",
    tags=("llm-data", "text"),
)
def q141_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn 12 word-level BPE merges over the corpus: per iteration, one
    explode + map-side-combinable pair count, a ONE-ROW distributed argmax
    (count desc, pair lexicographic — deterministic), and a pure-JVM fold
    that rewrites each document's symbol array left-to-right. The corpus
    is re-materialized per iteration (k-means/CC lineage-cut contract);
    the driver touches one row per merge."""
    from python_async_sample_spark.operators.bpe import learn_bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe(docs, "doc_id", "text", n_merges=12)
    return spark.createDataFrame(
        [
            (i + 1, a.replace("\x1e", " "), b.replace("\x1e", " "), c)
            for i, (a, b, c) in enumerate(merges)
        ],
        "rank int, left string, right string, pair_count bigint",
    ).orderBy("rank")


from python_async_sample_spark.operators.bpe import (
    bpe_encode_oracle_sql as _bpe_encode_oracle,
)


@query(
    "q179_bpe_encode",
    # full train->encode round trip oracled: the DuckDB replay re-learns the
    # merges AND re-applies them, so both learn_bpe and segment_with_merges
    # (the tokenize-with-vocab path q141 leaves untested at the oracle
    # level) must agree with an independent engine per document
    oracle=_bpe_encode_oracle("documents", "doc_id", "text", n_merges=8),
    ref="BPE tokenization/encode with a learned vocabulary (beyond reference; the apply side of q141's training loop)",
    tags=("llm-data", "text"),
)
def q179_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with a just-learned 8-merge BPE vocabulary and
    account per document: whitespace tokens in, BPE symbols out, symbols
    merged away. Training is q141's loop; ENCODING is one pure-JVM fold
    per merge over each document's symbol array — embarrassingly parallel,
    no shuffle at all (the merge list is a plan literal, never a join).
    The token-count deltas feed packing/budget stages (q47/q122), which
    is why the per-document accounting — not just the vocabulary — needs
    certification."""
    from python_async_sample_spark.operators.bpe import learn_bpe

    docs = load_table(spark, sf_dir, "documents")
    # return_corpus: training already rewrote the corpus merge by merge —
    # the encoded relation is free (segment_with_merges replays the same
    # folds for a vocabulary learned elsewhere; pinned equal in test_bpe)
    _merges, seg_syms = learn_bpe(docs, "doc_id", "text", n_merges=8, return_corpus=True)
    seg = seg_syms.select("doc", F.size("syms").cast("bigint").alias("n_syms"))
    ws = docs.select(
        F.col("doc_id").alias("doc"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_ws_tokens"),
    )
    return (
        seg.join(ws, "doc")
        .select(
            F.col("doc").alias("doc_id"),
            "n_ws_tokens",
            F.col("n_syms").alias("n_bpe_symbols"),
            (F.col("n_ws_tokens") - F.col("n_syms")).cast("bigint").alias("merged_away"),
        )
        .orderBy("doc_id")
    )


@query(
    "q146_batch_inference",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             length(string_split(text, ' ')) AS n_tokens,
             length(text) AS n_chars,
             length(list_distinct(string_split(text, ' ')))
               * 1.0 / length(string_split(text, ' ')) AS distinct_ratio
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             1.0 / (1.0 + exp(-(-2.0
                                + 0.015 * least(n_tokens, 400)
                                + 3.0  * distinct_ratio
                                - 0.002 * (n_chars * 1.0 / n_tokens)))) AS p
      FROM feats
    )
    SELECT doc_id, round(p, 6) AS score, CAST(p >= 0.5 AS BOOLEAN) AS keep
    FROM scored ORDER BY doc_id
    """,
    ref="distributed batch model inference (beyond reference; load-once-per-worker mapInPandas harness, oracled via the frozen model)",
    tags=("llm-data", "inference"),
)
def q146_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-scoring stage as a BATCH-INFERENCE harness: Arrow-batched
    mapInPandas with a once-per-worker model load — the pattern that makes
    heavyweight models viable at scale (q114 computes the same frozen
    logistic as pure expressions; the shared weights make this harness
    oracle-able, and a framework model slots into the loader unchanged).
    Map-only: no shuffle before the gate's orderBy."""
    from python_async_sample_spark.operators.inference import batch_score

    docs = load_table(spark, sf_dir, "documents")
    out = batch_score(docs.select("doc_id", "text"), "text", "score")
    return out.select(
        "doc_id",
        F.round("score", 6).alias("score"),
        (F.col("score") >= 0.5).alias("keep"),
    ).orderBy("doc_id")


_AUC_ORACLE = """
    WITH scored AS (
      SELECT doc_id,
             round(1.0 / (1.0 + exp(-(
               -2.0
               + 0.015 * least(len(string_split(text, ' ')), 400)
               + 3.0 * (len(list_distinct(string_split(text, ' '))) * 1.0
                        / len(string_split(text, ' ')))
               - 0.002 * (length(text) * 1.0 / len(string_split(text, ' ')))
             ))), 6) AS s,
             CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    by_s AS (
      SELECT s, count(*) AS cnt, sum(y) AS pos FROM scored GROUP BY 1
    ),
    ranked AS (
      SELECT s, cnt, pos,
             coalesce(sum(cnt) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rank_lo
      FROM by_s
    ),
    agg AS (
      SELECT sum(pos * (rank_lo + (cnt + 1) / 2.0)) AS r_pos,
             sum(pos) AS n_pos, sum(cnt - pos) AS n_neg
      FROM ranked
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           round((r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6) AS auc
    FROM agg
"""


@query(
    "q175_classifier_auc",
    oracle=_AUC_ORACLE,
    ref="analytics-auc / Mann-Whitney U (beyond reference; the evaluation verb for q114/q146's model scores)",
    tags=("analytics", "stats", "llm-data"),
)
def q175_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of q114's frozen quality classifier against a long-document
    label, computed exactly as the tie-corrected Mann–Whitney U statistic:
    AUC = (R₊ − n₊(n₊+1)/2) / (n₊·n₋) with AVERAGE ranks over tie groups —
    the model-evaluation verb every scored corpus needs before thresholds
    are chosen (AUC is also P(random positive outranks random negative)).

    Scale shape: scores round to 6 decimals BEFORE ranking, so ties are
    identical on both engines AND the rank computation collapses to the
    distinct-score relation — the only unpartitioned window runs over at
    most 10⁶+1 rows regardless of corpus size (scores live in [0,1]);
    everything corpus-sized is one scan + one groupBy(score)."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    z = (
        F.lit(-2.0)
        + F.lit(0.015) * F.least(n_tokens, F.lit(400))
        + F.lit(3.0) * (F.size(F.array_distinct(toks)) * F.lit(1.0) / n_tokens)
        - F.lit(0.002) * (F.length("text") * F.lit(1.0) / n_tokens)
    )
    scored = docs.select(
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("s"),
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("y"),
    )
    by_s = scored.groupBy("s").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    w_excl = W.orderBy("s").rowsBetween(W.unboundedPreceding, -1)
    ranked = by_s.select(
        "s",
        "cnt",
        "pos",
        F.coalesce(F.sum("cnt").over(w_excl), F.lit(0)).alias("rank_lo"),
    )
    agg = ranked.agg(
        F.sum(F.col("pos") * (F.col("rank_lo") + (F.col("cnt") + 1) / 2.0)).alias("r_pos"),
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).alias("n_neg"),
    )
    return agg.select(
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        F.round(
            (F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
            / (F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


from python_async_sample_spark.operators.text import shingle_boilerplate_clean

@query(
    "q188_boilerplate_removal",
    oracle="""
    WITH docs2 AS MATERIALIZED (
      SELECT doc_id, source,
             concat('site ', source, ' navigation home about contact login ',
                    text,
                    ' footer terms privacy copyright ', source, ' network')
               AS text2
      FROM documents
    ),
    tk AS MATERIALIZED (
      SELECT doc_id, source, string_split(text2, ' ') AS toks,
             len(string_split(text2, ' ')) AS n_tokens
      FROM docs2
    ),
    spine AS (
      SELECT unnest(generate_series(1, (SELECT max(n_tokens) FROM tk))) AS i
    ),
    starts AS MATERIALIZED (
      SELECT t.doc_id, t.source, s.i,
             array_to_string(t.toks[s.i:s.i+4], ' ') AS sh
      FROM tk t JOIN spine s ON s.i <= t.n_tokens - 4
    ),
    nsrc AS (
      SELECT source, count(DISTINCT doc_id) AS n_docs FROM docs2 GROUP BY 1
    ),
    boiler AS MATERIALIZED (
      SELECT b.source, b.sh
      FROM (
        SELECT source, sh, count(DISTINCT doc_id) AS df_docs
        FROM starts GROUP BY 1, 2
      ) b JOIN nsrc USING (source)
      WHERE b.df_docs * 10 >= 3 * n_docs
    ),
    covered AS MATERIALIZED (
      SELECT DISTINCT doc_id, pos FROM (
        SELECT st.doc_id, unnest(generate_series(st.i, st.i + 4)) AS pos
        FROM starts st JOIN boiler b ON b.source = st.source AND b.sh = st.sh
      )
    ),
    tokrows AS (
      SELECT t.doc_id, t.n_tokens, s.i AS pos, t.toks[s.i] AS tok
      FROM tk t JOIN spine s ON s.i <= t.n_tokens
    ),
    kept AS (
      SELECT k.doc_id, k.pos, k.tok
      FROM tokrows k LEFT JOIN covered c
        ON c.doc_id = k.doc_id AND c.pos = k.pos
      WHERE c.doc_id IS NULL
    ),
    agg AS (
      SELECT doc_id, count(*) AS n_kept,
             array_to_string(list(tok ORDER BY pos), ' ') AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(t.n_tokens - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(a.clean_text, '') AS clean_text
    FROM tk t LEFT JOIN agg a USING (doc_id)
    ORDER BY t.doc_id
    """,
    ref=(
        "corpus boilerplate removal (CCNet/RefinedWeb frequent-line dedup "
        "re-expressed for token shingles) — beyond the reference surface; "
        "nearest analog is its validation side-output discipline "
        "(nikon_ETL.py error rows: remove-and-account, never silently drop)"
    ),
    tags=("llm-data", "text", "dedup"),
)
def q188_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source template removal: every doc gets its source's synthetic
    navigation header and legal footer prepended/appended (both engines
    build the same strings — the fixture pattern q176 uses for PNGs), the
    detector must find exactly those shingles as >=30%-document-frequency
    boilerplate, and the cleaner must strip every covered token while
    preserving the body verbatim.  The oracle recomputes detection AND
    removal from first principles, so a missed shingle, an off-by-one in
    coverage, or a reordered reassembly all hash-mismatch."""
    docs = load_table(spark, sf_dir, "documents")
    header = F.concat(
        F.lit("site "), F.col("source"),
        F.lit(" navigation home about contact login ")
    )
    footer = F.concat(
        F.lit(" footer terms privacy copyright "), F.col("source"), F.lit(" network")
    )
    templated = docs.select(
        "doc_id", "source", F.concat(header, F.col("text"), footer).alias("text2")
    )
    return shingle_boilerplate_clean(
        templated, id_col="doc_id", text_col="text2", group_col="source",
        n=5, df_num=3, df_den=10,
    ).orderBy("doc_id")
