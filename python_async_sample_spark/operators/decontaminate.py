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
from python_async_sample_spark.operators.text import fan_out_small


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
    # Fan a small source out before the CPU-heavy shingle explode: a
    # single-split scan otherwise runs the whole corpus's Generate +
    # partial aggregation in ONE task (measured 2.95 s serial inside q145;
    # guide §2.5 input parallelism). A real 100 TB scan has more splits
    # than cores and skips this — the shared guard (ADVICE r10: one
    # definition in operators.text, not an inline copy per module).
    train_df = fan_out_small(train_df)
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


def semantic_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.30,
    max_eval: int = 4096,
) -> DataFrame:
    """SEMANTIC decontamination screen: flag corpus vectors whose cosine to
    ANY eval-set vector reaches ``threshold``, with the best-matching eval
    id — the embedding-space analog of the n-gram screen above (paraphrased
    or re-tokenized benchmark leaks share no exact n-grams but sit next to
    the benchmark in embedding space).

    Returns (corpus_id, matched_eval_id, cosine) for flagged rows only:
    ``matched_eval_id`` is the eval vector with the HIGHEST cosine on the
    1e-6 grid, ties to the lowest eval id — fully deterministic and
    SQL-replayable (cosines rounded identically on both sides).

    Scale shape: the eval side is benchmark-sized by construction and is
    the ONLY driver-side state — collected once, sorted by id, capped at
    ``max_eval`` rows (raise, never silently truncate), then closed over
    by an Arrow kernel that scores each corpus batch against the whole
    eval matrix in one GEMM. One corpus scan, zero shuffles, no corpus
    row ever leaves its partition; the anti-join to drop flagged docs is
    the caller's one shuffle, same as :func:`decontaminate`.
    """
    import numpy as np
    import pandas as pd

    ev_rows = (
        eval_df.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .orderBy(id_col)
        .limit(max_eval + 1)
        .collect()
    )
    if len(ev_rows) > max_eval:
        raise ValueError(
            f"eval set exceeds max_eval={max_eval} rows — a benchmark suite "
            "should be small; raise the cap explicitly if this is intended"
        )
    if not ev_rows:
        raise ValueError("eval set is empty — nothing to screen against")
    ev_ids = np.array([r[0] for r in ev_rows], dtype=np.int64)
    ev = np.vstack([r[1] for r in ev_rows])
    ev = ev / np.linalg.norm(ev, axis=1, keepdims=True)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            xs = np.vstack(pdf["_v"].to_numpy())
            xs = xs / np.linalg.norm(xs, axis=1, keepdims=True)
            sims = np.round(xs @ ev.T, 6)
            j = np.argmax(sims, axis=1)  # first max = lowest eval id
            best = sims[np.arange(len(sims)), j]
            mask = best >= threshold
            yield pd.DataFrame(
                {
                    "corpus_id": pdf["_id"].to_numpy()[mask],
                    "matched_eval_id": ev_ids[j[mask]],
                    "cosine": best[mask],
                }
            )

    return (
        # cast BEFORE the kernel: the stored column is float32, and a
        # float32 GEMM diverges from the oracle's double math at ~1e-7 —
        # above the 1e-6 grid (caught by the sf0.1 portability pass)
        corpus.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .mapInPandas(
            kernel,
            schema="corpus_id bigint, matched_eval_id bigint, cosine double",
        )
    )
