"""Mergeable partial aggregates — incremental rollup maintenance.

The reference refreshes its summary materialized view by full recompute
(``REFRESH MATERIALIZED VIEW``, ``dbs/nikon.py:188-197``); at 100 TB a
dashboard cannot rescan raw facts per refresh. The scale pattern is the
two-level MERGEABLE aggregate: maintain fine-grain partials (one small row
per (key, day), appended incrementally by the watermark pipeline), and
serve any coarser grain by MERGING partials — sums add, counts add, mins
min, maxes max, and avg is re-derived as merged_sum/merged_count. The
merge reads the partial table (KB-to-MB scale), never the fact table.

Only algebraic/distributive aggregates qualify (sum/count/min/max, and
sketches — HLL and KLL merge too, see ``operators/sketches``); a median is
NOT mergeable and must come from a sketch. ``MERGEABLE`` encodes the
partial-side and merge-side function per op, which is exactly the
partial/final split Spark itself performs inside a single aggregation
(partial_sum → sum) — this operator lifts that split across TABLES so the
partial state can be persisted between runs.

q107 pins correctness: merging day-partials to month must hash-match the
direct month aggregate computed from raw.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# op -> (partial aggregate, merge aggregate)
MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def build_partials(
    df: DataFrame,
    keys: list[str | Column],
    specs: list[tuple[str, str, str]],
) -> DataFrame:
    """Fine-grain partial table: one row per distinct ``keys`` with one
    column per (value_col, op, alias) spec."""
    aggs = [MERGEABLE[op][0](F.col(c)).alias(alias) for c, op, alias in specs]
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    partials: DataFrame,
    keys: list[str | Column],
    specs: list[tuple[str, str, str]],
) -> DataFrame:
    """Roll partials up to the coarser ``keys`` — touches ONLY the partial
    table. ``specs`` aliases must match :func:`build_partials`' output."""
    aggs = [MERGEABLE[op][1](F.col(alias)).alias(alias) for _, op, alias in specs]
    return partials.groupBy(*keys).agg(*aggs)
