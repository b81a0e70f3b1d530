"""Recursive-hierarchy operators: BFS flatten (level / root / path) and
subtree rollups — the WITH RECURSIVE surface of a warehouse, re-expressed
as bounded iterative joins.

Spark has no recursive CTE, but a hierarchy walk is depth-bounded (org
charts, BOM explosions, account trees: tens of levels, not thousands), so
the idiomatic plan is one equi-join per LEVEL — each fully
partition-parallel over the frontier — with a lineage cut per iteration.
Per-level driver work is one count() on the frontier (the loop-termination
probe), never row data; a cycle or over-deep tree raises instead of
looping forever.

Reference tie-in: the reference has no hierarchy walk; its closest shape
is the bounded chunked loop of the incremental pipeline
(nikon_ETL.py:120-151) — same "iterate a bounded number of data-parallel
steps, verify progress each step" discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_hierarchy(
    nodes: DataFrame,
    id_col: str,
    parent_col: str,
    max_depth: int = 32,
) -> DataFrame:
    """BFS from the roots (``parent IS NULL``): returns one row per
    REACHABLE node — (id, level, root_id, path) with ``path`` the
    '/'-joined id chain from the root.  Raises when ``max_depth`` levels
    still leave a non-empty frontier (cycle, orphan loop, or genuinely
    deeper tree — the caller decides which)."""
    edges = nodes.select(
        F.col(id_col).alias("__id"), F.col(parent_col).alias("__parent")
    )
    frontier = edges.where(F.col("__parent").isNull()).select(
        "__id",
        F.lit(0).alias("level"),
        F.col("__id").alias("root_id"),
        F.col("__id").cast("string").alias("path"),
    )
    out = frontier
    # one extra probe iteration: a tree whose deepest level is EXACTLY
    # max_depth is complete and must not raise — only a non-empty frontier
    # BEYOND max_depth levels is over-deep/cyclic
    for depth in range(max_depth + 1):
        frontier = (
            edges.join(
                frontier.select(
                    F.col("__id").alias("__parent"), "level", "root_id", "path"
                ),
                "__parent",
            )
            .select(
                "__id",
                (F.col("level") + 1).alias("level"),
                "root_id",
                F.concat_ws("/", "path", F.col("__id").cast("string")).alias("path"),
            )
            .localCheckpoint(eager=False)  # cut per-level lineage growth
        )
        if frontier.isEmpty():
            break
        if depth == max_depth:
            raise RuntimeError(
                f"hierarchy deeper than max_depth={max_depth} (or cyclic) — "
                "refusing to walk further"
            )
        out = out.unionByName(frontier)
    return out.select(F.col("__id").alias(id_col), "level", "root_id", "path")


def ancestor_closure(
    nodes: DataFrame, id_col: str, parent_col: str, max_depth: int = 32
) -> DataFrame:
    """All (id, ancestor) pairs, ancestors strictly above the node.  Size
    is Σ depth(node) — linear in nodes for bounded-depth trees, NEVER the
    quadratic all-pairs.  Same per-level loop discipline as
    :func:`flatten_hierarchy`."""
    edges = nodes.select(
        F.col(id_col).alias("__id"), F.col(parent_col).alias("__parent")
    )
    step = edges.where(F.col("__parent").isNotNull()).select(
        "__id", F.col("__parent").alias("anc")
    )
    out = step
    # same +1 probe as flatten_hierarchy: chains of EXACTLY max_depth are
    # complete; only progress beyond that is over-deep/cyclic
    for depth in range(max_depth + 1):
        step = (
            step.join(
                edges.where(F.col("__parent").isNotNull()).select(
                    F.col("__id").alias("anc"), F.col("__parent").alias("__next")
                ),
                "anc",
            )
            .select("__id", F.col("__next").alias("anc"))
            .localCheckpoint(eager=False)
        )
        if step.isEmpty():
            break
        if depth == max_depth:
            raise RuntimeError(
                f"ancestor chain longer than max_depth={max_depth} (or cyclic)"
            )
        out = out.unionByName(step)
    return out.select(F.col("__id").alias(id_col), "anc")


def subtree_rollup(
    nodes: DataFrame,
    id_col: str,
    parent_col: str,
    agg_cols: dict[str, F.Column],
    max_depth: int = 32,
) -> DataFrame:
    """Per-node aggregate over its ENTIRE subtree (the node included):
    closure pairs (self ∪ ancestors) joined to the node values, one
    groupBy per ancestor.  ``agg_cols`` maps output name → aggregate
    expression over the descendant rows."""
    closure = ancestor_closure(nodes, id_col, parent_col, max_depth)
    self_pairs = nodes.select(
        F.col(id_col), F.col(id_col).alias("anc")
    )
    pairs = self_pairs.unionByName(closure.select(id_col, "anc"))
    joined = pairs.join(nodes, id_col)
    return (
        joined.groupBy("anc")
        .agg(*[expr.alias(name) for name, expr in agg_cols.items()])
        .withColumnRenamed("anc", id_col)
    )
