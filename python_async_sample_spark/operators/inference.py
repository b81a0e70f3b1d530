"""Distributed batch model inference over a DataFrame.

Beyond the reference's inventory: every modern curation pipeline has a
"score each row with a model" stage (quality classifiers, rerankers,
embedding encoders). The engine-side pattern is the same regardless of the
model framework:

* the model loads ONCE PER PYTHON WORKER, not per row or per batch — the
  kernel closes over a lazily-initialized handle (``mapInPandas`` keeps one
  Python process per task slot, so initialization amortizes over every
  Arrow batch that worker sees);
* rows flow through as Arrow record batches sized by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — the inference harness
  sees contiguous column arrays, ready for vectorized/tensor scoring;
* the operator is schema-stable: input columns pass through, scores are
  appended, so it composes with filters/joins like any other DataFrame op;
* no shuffle is introduced — scoring is row-local (map-only), and Spark
  schedules it alongside the scan.

The sandbox has no ML frameworks, so ``LinearTextModel`` is the
deterministic stand-in: a frozen logistic over cheap text features with
the SAME weights as q114's expression form — which makes the harness
ORACLE-ABLE (q146 pins mapInPandas inference against the pure-SQL
scoring). A real framework model slots into ``loader`` unchanged.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class LinearTextModel:
    """Frozen logistic quality model (q114's weights, vectorized in numpy).

    Stands in for any loaded model object; `predict` consumes a batch of
    texts and returns per-row scores."""

    def __init__(self) -> None:
        import numpy as np

        self._np = np
        self.bias = -2.0
        self.w_tokens, self.w_distinct, self.w_chars = 0.015, 3.0, -0.002

    def predict(self, texts) -> Any:
        np = self._np
        # null texts score as empty strings instead of crashing the Arrow
        # batch — a single NULL row must never fail the task (the same
        # no-abort contract as operators/validate.py); len(t.split(' '))
        # is 1 for '' so every downstream ratio stays finite
        texts = ["" if t is None else t for t in texts]
        n_tokens = np.array([len(t.split(" ")) for t in texts], dtype=np.float64)
        n_distinct = np.array(
            [len(set(t.split(" "))) for t in texts], dtype=np.float64
        )
        n_chars = np.array([len(t) for t in texts], dtype=np.float64)
        z = (
            self.bias
            + self.w_tokens * np.minimum(n_tokens, 400.0)
            + self.w_distinct * (n_distinct / n_tokens)
            + self.w_chars * (n_chars / n_tokens)
        )
        return 1.0 / (1.0 + np.exp(-z))


def batch_score(
    df: DataFrame,
    text_col: str,
    score_col: str = "score",
    loader: Callable[[], Any] = LinearTextModel,
) -> DataFrame:
    """Append ``score_col`` = model.predict(text) via Arrow-batched
    map-only inference. ``loader`` runs at most once per Python worker —
    the load-once/score-many contract that makes heavyweight models viable
    at 100 TB."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    # build a NEW StructType: StructType.add mutates the instance, and
    # df.schema hands back the DataFrame's cached schema object
    out_schema = StructType(
        list(df.schema.fields) + [StructField(score_col, DoubleType())]
    )
    cols = df.columns

    def kernel(batches: Iterator) -> Iterator:
        model = None  # lazy: one load per worker process, amortized
        for pdf in batches:
            if model is None:
                model = loader()
            pdf[score_col] = model.predict(pdf[text_col].tolist())
            yield pdf[cols + [score_col]]

    return df.mapInPandas(kernel, schema=out_schema)
