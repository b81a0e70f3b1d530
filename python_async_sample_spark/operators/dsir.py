"""DSIR-style data selection: hashed n-gram importance resampling.

Implements the scoring core of Data Selection via Importance Resampling
(Xie et al., NeurIPS 2023): documents are featurized as counts over a
FIXED number of hashed word-n-gram buckets, a target corpus and the raw
candidate pool each induce a smoothed multinomial over those buckets, and
every candidate is scored by its average per-n-gram log importance ratio
log p_target(b) - log p_raw(b).  Selecting the top scorers yields raw
documents that "look like" the target domain — the standard recipe for
carving a Wikipedia-like slice out of a web crawl.

Scale posture (the reason this shape survives 100 TB):

* the exploded n-gram relation is token-proportional and aggregates with
  map-side partial combine into per-(doc, bucket) counts — the only wide
  shuffle, carrying at most ``n_buckets`` rows per document;
* both distributions and the log-ratio table are ``n_buckets`` rows
  (fixed, independent of corpus size) and ride a broadcast join back onto
  the per-doc counts — the corpus is never shuffled a second time;
* no driver state at all: totals stay in-plan via a one-row cross join.

Cross-engine exactness: the bucket hash is the first four hex digits of
md5 (bit-identical in Spark and DuckDB, the q187 convention), and the
log-ratio is snapped to a 1e-6 fixed-point BIGINT grid before any
per-document summation, so scores are exact integer arithmetic — bucket
iteration order can never wiggle a float sum between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-point grid for the per-bucket log ratio (1e-6 units).
_LR_SCALE = 1_000_000


def ngram_bucket(col: Column | str, n_buckets: int) -> Column:
    """Portable hash bucket of a string: int of md5's first 4 hex digits,
    mod ``n_buckets`` (needs n_buckets <= 65536 to use all hash bits)."""
    if n_buckets > 65536:
        raise ValueError("ngram_bucket uses 16 hash bits; n_buckets must be <= 65536")
    h16 = F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("long")
    return (h16 % n_buckets).cast("int")


def word_ngrams(text_col: Column | str, n: int) -> Column:
    """Array of word n-grams (space-joined, non-distinct, order preserved).
    Tokens are a plain single-space split — identical to the DuckDB
    ``string_split(text, ' ')`` convention the oracles replay."""
    w = F.split(text_col, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.array_join(F.slice(w, i, n), " "),
    )
    return F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<string>"))


def hashed_ngram_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    n_buckets: int = 1024,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document hashed-n-gram bucket counts: (id, *carry, bucket, cnt).

    One explode + one groupBy; partial aggregation collapses each task's
    gram stream to <= n_buckets rows per document before the shuffle.
    """
    ex = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode(word_ngrams(F.col(text_col), n)).alias("_gram"),
    )
    return (
        ex.select(
            id_col, *carry_cols, ngram_bucket(F.col("_gram"), n_buckets).alias("bucket")
        )
        .groupBy(id_col, *carry_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_ratio_table(
    per_doc_counts: DataFrame,
    is_target: Column,
    *,
    n_buckets: int = 1024,
    alpha: float = 0.5,
) -> DataFrame:
    """(bucket, lr) for every bucket in [0, n_buckets): the Laplace-smoothed
    log importance ratio ln p_target(b) - ln p_raw(b), snapped to the 1e-6
    integer grid (``lr`` is BIGINT micro-nats).

    ``per_doc_counts`` is :func:`hashed_ngram_counts` output; ``is_target``
    is a boolean Column over its carried columns splitting target corpus
    from raw pool.  Everything here is n_buckets-sized — broadcast it.
    """
    side = per_doc_counts.groupBy(is_target.alias("is_t"), F.col("bucket")).agg(
        F.sum("cnt").alias("c")
    )
    tgt = side.where(F.col("is_t")).select("bucket", F.col("c").alias("t"))
    raw = side.where(~F.col("is_t")).select("bucket", F.col("c").alias("r"))
    tot = side.groupBy().agg(
        F.coalesce(F.sum(F.when(F.col("is_t"), F.col("c"))), F.lit(0)).alias("tt"),
        F.coalesce(F.sum(F.when(~F.col("is_t"), F.col("c"))), F.lit(0)).alias("rr"),
    )
    spark = per_doc_counts.sparkSession
    all_buckets = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    ab = float(alpha) * n_buckets
    joined = (
        all_buckets.join(tgt, "bucket", "left")
        .join(raw, "bucket", "left")
        .crossJoin(F.broadcast(tot))
    )
    lr = F.log(
        (F.coalesce(F.col("t"), F.lit(0)) + F.lit(float(alpha)))
        / (F.col("tt") + F.lit(ab))
    ) - F.log(
        (F.coalesce(F.col("r"), F.lit(0)) + F.lit(float(alpha)))
        / (F.col("rr") + F.lit(ab))
    )
    # floor(x + 0.5) on BOTH engines (the oracle spells the same expression):
    # F.round here would be Spark's HALF_UP on the shortest decimal repr
    # while DuckDB rounds the exact binary value half-away — a ratio landing
    # on an exact micro-nat half could split engines by 1 (ADVICE r9).  With
    # an identical convention the only residual divergence is the ~1-ulp
    # Math.log vs C ln difference, which floor(x+0.5) only exposes when the
    # product sits within an ulp of an exact half (~1e-16 relative).
    return joined.select(
        "bucket", F.floor(lr * _LR_SCALE + F.lit(0.5)).cast("bigint").alias("lr")
    )


def dsir_select(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    *,
    k: int,
    n: int = 2,
    n_buckets: int = 1024,
    alpha: float = 0.5,
) -> DataFrame:
    """Top-``k`` raw-pool documents by average log importance ratio.

    Returns (id, n_ngrams BIGINT, dsir_score_micro BIGINT) —
    ``dsir_score_micro`` is the length-normalized ratio in MICRO-nats
    (the normalization removes the long-document bias of the raw log
    weight), computed as half-away-from-zero integer rounding of the
    exact rational s/n via pure int arithmetic: sign(s)·((2|s|+n) div 2n).
    A double `round(s/n/1e6, 6)` here is NOT engine-portable — when s/n
    lands on an exact 7th-decimal half (n divides s into .xxxxxx5), Spark
    HALF_UPs the double's shortest decimal repr while DuckDB/Python round
    its exact binary value, and the two sides differ by one ulp of output
    (caught by the hypothesis reference at (s=-14875228, n=8)); integer
    micro-nats make every emitted value exact.  Selection order is the
    IEEE double quotient of the exact integers s and n (both engines divide
    the same two BIGINTs, so the quotient — and hence the order — is
    identical on both; two docs whose distinct rationals round to the same
    double tie-break by id), so the pick is deterministic and
    engine-portable.

    Overflow bound: ``s = Σ cnt·lr`` accumulates in BIGINT (non-ANSI Spark
    wraps silently; DuckDB promotes to HUGEINT).  |lr| is bounded by
    ~ln(total_grams) + ln(n_buckets/alpha) micro-nats (< ~5e7 for any real
    corpus), so wraparound needs ~2e11 n-grams in ONE document — ~1 TB of
    text in a single row, far past any realistic document.  Cast to
    decimal before the sum if documents can be arbitrarily large.
    """
    flagged = docs.select(
        F.col(id_col), F.col(text_col), is_target.alias("_is_target")
    )
    per = hashed_ngram_counts(
        flagged, id_col, text_col, n=n, n_buckets=n_buckets,
        carry_cols=("_is_target",),
    )
    ratio = dsir_log_ratio_table(
        per, F.col("_is_target"), n_buckets=n_buckets, alpha=alpha
    )
    scored = (
        per.where(~F.col("_is_target"))
        .join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("cnt") * F.col("lr")).alias("_s"),
            F.sum("cnt").alias("n_ngrams"),
        )
    )
    avg = F.col("_s") * 1.0 / F.col("n_ngrams")  # exact ints -> one IEEE divide
    micro = F.expr(
        "CAST(CASE WHEN _s < 0 THEN -1 ELSE 1 END"
        " * ((2 * abs(_s) + n_ngrams) div (2 * n_ngrams)) AS BIGINT)"
    )
    return (
        scored.orderBy(avg.desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            F.col("n_ngrams").cast("bigint").alias("n_ngrams"),
            micro.alias("dsir_score_micro"),
        )
    )
