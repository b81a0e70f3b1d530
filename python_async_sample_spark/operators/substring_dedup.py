"""Cross-document repeated n-gram span detection (substring-level dedup).

Beyond the reference's inventory: document-level dedup (exact / MinHash /
SimHash, ``operators/dedup.py``) misses the pathology Lee et al. (2021,
"Deduplicating Training Data Makes Language Models Better") target —
*substrings* repeated verbatim across otherwise-distinct documents
(boilerplate, licenses, templated headers). The exact suffix-array approach
is sequential; the Spark-native equivalent works at n-gram granularity:

1. explode each document into POSITIONAL word n-grams (``doc, pos, gram``);
2. a gram is *duplicated* when it occurs in >= 2 distinct documents
   (within-doc repetition is a different signal — ``operators/text.py``'s
   ``repetition_stats``);
3. mark each document's duplicated positions and report per-doc accounting:
   how many gram positions are duplicated, and the longest RUN of
   consecutive duplicated positions (a run of k marked positions is a
   verbatim shared span of k+n-1 words — the thing you would excise).

Scale posture (100 TB corpus):

* the positional explode is O(corpus tokens) rows but pure JVM built-ins
  (split -> transform -> explode), one scan, no Python;
* duplicated-gram mining is one map-side-combinable groupBy on the gram —
  never a broadcast of the gram vocabulary (the q89 lesson: vocabularies
  are data-sized, only key-partitioned shuffles survive 100x);
* the mark step is a shuffle semi-join on the gram key, and the run-length
  step is a per-doc window — partitioned by doc, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from python_async_sample_spark.operators.text import fan_out_small


def positional_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc, pos, gram) rows: every word n-gram with its 0-based start
    position. Unlike ``dedup.with_shingles`` this is NOT distinct — position
    identity is the point."""
    words = F.split(F.col(text_col), " ")
    pairs = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.struct(
                i.alias("pos"), F.concat_ws(" ", F.slice(words, i + 1, n)).alias("gram")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gram:string>>"))
    return df.select(F.col(id_col).alias("doc"), F.explode(pairs).alias("pg")).select(
        "doc", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram")
    )


def repeated_span_report(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 8
) -> DataFrame:
    """Per-document accounting of cross-document verbatim n-gram spans.

    Returns ``(doc, n_grams, n_dup_grams, dup_ratio, max_dup_run)`` for every
    document with at least one n-gram; ``max_dup_run`` is the longest
    consecutive run of duplicated positions (0 when clean) — a run of k
    covers a shared span of k+n-1 words.
    """
    # gram-slot counts need no explode at all: n_grams = max(|words|-n+1, 0)
    words = F.split(F.col(text_col), " ")
    sizes = df.select(
        F.col(id_col).alias("doc"),
        F.greatest(F.size(words) - (n - 1), F.lit(0)).cast("bigint").alias("n_grams"),
    ).where(F.col("n_grams") > 0)

    # the positional gram relation feeds two consumers (duplicate mining and
    # the mark join); materialize it once instead of re-running the
    # split->explode lineage per consumer — same contract as
    # ``dedup.shingle_index`` (at warehouse scale this IS the persisted
    # positional index table). Small sources fan out first so the explode
    # parallelizes; a real scan already has more splits than cores.
    grams = positional_shingles(fan_out_small(df), id_col, text_col, n).localCheckpoint(
        eager=True
    )

    # duplicated = gram seen in >=2 distinct docs. Key-partitioned shuffle;
    # the gram relation is data-sized, so no broadcast anywhere on this path.
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc").alias("ndocs"))
        .where(F.col("ndocs") >= 2)
        .select("gram")
    )
    marked = grams.join(dup, "gram", "left_semi")

    # classic gaps-and-islands: pos - row_number() is constant within a
    # consecutive run of marked positions. One linear chain over `marked`
    # yields BOTH the duplicated-slot count (sum of run lengths) and the
    # longest run — no second scan.
    run_grp = (F.col("pos") - F.row_number().over(W.partitionBy("doc").orderBy("pos"))).alias(
        "grp"
    )
    dup_stats = (
        marked.select("doc", "pos", run_grp)
        .groupBy("doc", "grp")
        .agg(F.count(F.lit(1)).alias("run"))
        .groupBy("doc")
        .agg(
            F.sum("run").cast("bigint").alias("n_dup_grams"),
            F.max("run").cast("bigint").alias("max_dup_run"),
        )
    )

    return sizes.join(dup_stats, "doc", "left").select(
        "doc",
        "n_grams",
        F.coalesce("n_dup_grams", F.lit(0)).cast("bigint").alias("n_dup_grams"),
        F.round(
            F.coalesce("n_dup_grams", F.lit(0)) / F.col("n_grams"), 4
        ).alias("dup_ratio"),
        F.coalesce("max_dup_run", F.lit(0)).cast("bigint").alias("max_dup_run"),
    )
