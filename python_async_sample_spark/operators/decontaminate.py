"""Benchmark decontamination: flag training documents that share n-grams
with an evaluation set.

Beyond the reference's inventory (BASELINE.json north star): before
pretraining, every corpus is screened against held-out benchmark text so the
model is not trained on its own test set. The standard screen is exact
n-gram collision (a training doc is contaminated if any length-n token
window also occurs in any eval doc).

Scale posture (100 TB corpus, benchmark suites of at most a few hundred MB):

* the eval side reduces to a DISTINCT shingle set — small enough to
  broadcast, so the screen is a broadcast semi/inner join against the train
  shingle stream: NO shuffle of the corpus, one scan;
* the train side reuses the same built-in split→slice shingling as the
  dedup pipelines (``operators/dedup.with_shingles``) — JVM codegen, no
  Python;
* output is per-doc hit accounting (how many of the doc's shingles are
  tainted), so callers can either hard-drop any hit or threshold on the
  contamination ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_async_sample_spark.operators.dedup import with_shingles


def eval_shingle_set(eval_df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """The DISTINCT n-gram set of the evaluation corpus (one column:
    ``shingle``). Small by construction — benchmark suites are tiny next to
    the training corpus — so callers broadcast it."""
    return with_shingles(eval_df, id_col, text_col, n).select("shingle").distinct()


def contamination_report(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Per-training-doc contamination accounting against the eval set.

    Returns (id, n_shingles, n_tainted, contamination) for every training
    document with at least one colliding n-gram: ``n_tainted`` counts the
    doc's distinct shingles that also occur anywhere in the eval set,
    ``contamination`` is the tainted fraction of the doc's shingles.

    The tainted count is an inner join against the broadcast eval set
    followed by one groupBy on the doc id — the corpus is scanned once and
    shuffled only by doc id for the count (map-side combinable).
    """
    train_sh = with_shingles(train_df, id_col, text_col, n)
    tainted = (
        train_sh.join(F.broadcast(eval_shingle_set(eval_df, id_col, text_col, n)), "shingle")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_tainted"))
    )
    sizes = train_sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        tainted.join(sizes, "doc")
        .select(
            F.col("doc").alias(id_col),
            "n_shingles",
            "n_tainted",
            (F.col("n_tainted") / F.col("n_shingles")).alias("contamination"),
        )
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    max_contamination: float = 0.0,
) -> DataFrame:
    """The filtered corpus: training docs whose contamination is at or below
    ``max_contamination`` (default: drop on any collision). An anti-join
    against the flagged ids — the corpus is never widened or re-shuffled."""
    flagged = (
        contamination_report(train_df, eval_df, id_col, text_col, n)
        .where(F.col("contamination") > max_contamination)
        .select(id_col)
    )
    return train_df.join(flagged, id_col, "left_anti")
