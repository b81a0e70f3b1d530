"""Privacy/governance operators for training-data release: k-anonymity
audit with a local-recoding generalization ladder.

A quasi-identifier combination shared by fewer than k rows re-identifies
people; the standard remedy ladder is (1) keep combos with >= k rows at
full granularity, (2) coarsen the most specific attribute one level and
re-test the leftovers, (3) suppress what still fails.  Everything is
groupBy-shaped — two aggregation passes over the failing remainder, no
row explosion, no driver data.

Reference tie-in: the reference's validation side-output discipline
(nikon_ETL.py error rows) — rows that fail a contract are diverted and
ACCOUNTED, never silently dropped; suppression here keeps that bar (the
suppressed count is part of the output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GENERALIZED = "ANY"
SUPPRESSED = "SUPPRESSED"


def k_anonymize_ladder(
    df: DataFrame,
    quasi_cols: list[str],
    ladder_col: str,
    k: int,
) -> DataFrame:
    """Two-level local recoding: rows whose full quasi-identifier combo
    (``quasi_cols`` + ``ladder_col``) reaches ``k`` keep level 0; the
    rest coarsen ``ladder_col`` to :data:`GENERALIZED` and re-test at
    level 1; combos still under ``k`` collapse into ONE level-2
    :data:`SUPPRESSED` row carrying their total count.

    Returns (``*quasi_cols``, ``ladder_col``, level, n) with every column
    stringified (sentinel levels need a common type).  Counts are
    partition-parallel groupBys; the level-1 pass aggregates only the
    level-0 FAILURES (typically the thin tail)."""
    cols = [F.col(c).cast("string").alias(c) for c in quasi_cols]
    lad = F.col(ladder_col).cast("string").alias(ladder_col)
    base = df.select(*cols, lad)

    lvl0 = base.groupBy(*quasi_cols, ladder_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    keep0 = lvl0.where(F.col("n") >= k).select(
        *quasi_cols, ladder_col, F.lit(0).cast("int").alias("level"), "n"
    )
    fail0 = lvl0.where(F.col("n") < k)

    lvl1 = fail0.groupBy(*quasi_cols).agg(F.sum("n").cast("bigint").alias("n"))
    keep1 = lvl1.where(F.col("n") >= k).select(
        *quasi_cols,
        F.lit(GENERALIZED).alias(ladder_col),
        F.lit(1).cast("int").alias("level"),
        "n",
    )
    suppressed = (
        lvl1.where(F.col("n") < k)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n"))
        .where(F.col("n") > 0)
        .select(
            *[F.lit(SUPPRESSED).alias(c) for c in quasi_cols],
            F.lit(SUPPRESSED).alias(ladder_col),
            F.lit(2).cast("int").alias("level"),
            "n",
        )
    )
    return keep0.unionByName(keep1).unionByName(suppressed)
