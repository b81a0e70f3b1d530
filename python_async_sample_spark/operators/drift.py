"""Distribution-drift detection (Population Stability Index).

The monitoring verb for pipeline health at 100 TB: compare today's value
distribution against a pinned reference window per segment.  Everything
reduces to counting into FIXED bins (quantile-derived edges would add a
cross-engine-fragile percentile stage; production drift monitors pin
edges for the same reproducibility reason), so the corpus-sized work is
one scan + one groupBy(segment, window, bin), and the PSI arithmetic runs
over the |segments|×|bins| spine — negligible at any volume.  The same
shape runs streaming: histogram counts are mergeable, so a stream can
maintain them in O(segments×bins) state and the PSI join happens on the
tiny aggregate (q160).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fixed_bin(value_col: str, width: float, nbins: int) -> F.Column:
    """Fixed-width bin index clamped into [0, nbins): values below 0 land in
    bin 0 and values past the last edge in bin nbins−1, so every non-NULL
    row is counted — a negative metric must move the histogram, not silently
    fall off the spine.

    NULL values stay NULL (a missing metric has no position on a numeric
    spine): the downstream bin-spine join drops NULL-bin groups identically
    on every engine, so NULLs are excluded from the histogram and its
    totals rather than masquerading as the lowest value (Spark's greatest()
    skips NULL operands, which would otherwise send NULL to bin 0 while
    DuckDB's version-dependent greatest() NULL handling dropped or kept the
    row).  Monitor missingness as its own counter, not as a bin."""
    clamped = F.least(
        F.greatest(F.floor(F.col(value_col) / width), F.lit(0)),
        F.lit(nbins - 1),
    ).cast("bigint")
    return F.when(F.col(value_col).isNotNull(), clamped)


def psi_from_counts(
    cnt: DataFrame, segment_col: str = "event_type", nbins: int = 10, smoothing: float = 0.5
) -> DataFrame:
    """PSI per segment from sparse per-bin counts.

    ``cnt`` holds (segment, bin, c1, c2) with absent bins omitted; the full
    0..nbins-1 spine is rebuilt per segment so empty bins contribute their
    smoothed mass.  PSI = Σ (p₂−p₁)·ln(p₂/p₁) with additive ``smoothing``
    per bin; > 0.2 is the conventional drift alarm.  Output:
    (segment, n_ref, n_cur, psi) rounded to 6.
    """
    spine = (
        cnt.select(segment_col)
        .distinct()
        .select(segment_col, F.explode(F.sequence(F.lit(0), F.lit(nbins - 1))).alias("b"))
        .select(segment_col, F.col("b").cast("bigint").alias("bin"))
    )
    full_bins = (
        spine.join(cnt, [segment_col, "bin"], "left")
        .select(
            segment_col,
            "bin",
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
    )
    tot = full_bins.groupBy(segment_col).agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    s, sb = smoothing, smoothing * nbins
    p = full_bins.join(tot, segment_col).select(
        segment_col,
        "n1",
        "n2",
        ((F.col("c1") + s) / (F.col("n1") + sb)).alias("p1"),
        ((F.col("c2") + s) / (F.col("n2") + sb)).alias("p2"),
    )
    return (
        p.groupBy(segment_col)
        .agg(
            F.max("n1").cast("bigint").alias("n_ref"),
            F.max("n2").cast("bigint").alias("n_cur"),
            F.round(
                F.sum((F.col("p2") - F.col("p1")) * F.log(F.col("p2") / F.col("p1"))), 6
            ).alias("psi"),
        )
        .orderBy(segment_col)
    )
