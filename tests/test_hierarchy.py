"""Hierarchy walk edge cases: forests, cycles, orphans, depth guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_async_sample_spark.operators.hierarchy import (
    ancestor_closure,
    flatten_hierarchy,
    subtree_rollup,
)


def _nodes(spark, rows):
    return spark.createDataFrame(rows, "id long, parent long, v long")


def test_forest_levels_roots_paths(spark):
    #   1        2
    #   |        |
    #   10      20
    #   |
    #  100
    rows = [(1, None, 5), (2, None, 7), (10, 1, 11), (20, 2, 13), (100, 10, 17)]
    got = {r["id"]: r for r in flatten_hierarchy(_nodes(spark, rows), "id", "parent").collect()}
    assert got[1]["level"] == 0 and got[1]["root_id"] == 1 and got[1]["path"] == "1"
    assert got[100]["level"] == 2 and got[100]["root_id"] == 1
    assert got[100]["path"] == "1/10/100"
    assert got[20]["root_id"] == 2


def test_unreachable_cycle_is_excluded_not_walked(spark):
    """BFS from the roots returns REACHABLE nodes only: a disconnected
    2↔3 cycle simply never appears (it has no root above it), it does not
    hang the walk."""
    rows = [(1, None, 0), (2, 3, 0), (3, 2, 0)]
    got = flatten_hierarchy(_nodes(spark, rows), "id", "parent", max_depth=5)
    assert {r["id"] for r in got.collect()} == {1}


def test_cycle_raises_in_closure_and_depth_guard_fires(spark):
    # the closure DOES iterate parent chains, so a cycle must raise
    rows = [(1, None, 0), (2, 3, 0), (3, 2, 0)]
    with pytest.raises(RuntimeError, match="max_depth"):
        ancestor_closure(_nodes(spark, rows), "id", "parent", max_depth=5)
    # a reachable chain deeper than max_depth raises in the flatten too
    chain = [(1, None, 0)] + [(i, i - 1, 0) for i in range(2, 10)]
    with pytest.raises(RuntimeError, match="max_depth"):
        flatten_hierarchy(_nodes(spark, chain), "id", "parent", max_depth=3)


def test_subtree_rollup_counts_and_sums(spark):
    rows = [(1, None, 5), (10, 1, 11), (11, 1, 2), (100, 10, 17)]
    sub = {
        r["id"]: r
        for r in subtree_rollup(
            _nodes(spark, rows), "id", "parent",
            {"n": F.count(F.lit(1)).cast("bigint"), "s": F.sum("v").cast("bigint")},
        ).collect()
    }
    assert sub[1]["n"] == 4 and sub[1]["s"] == 35
    assert sub[10]["n"] == 2 and sub[10]["s"] == 28
    assert sub[11]["n"] == 1 and sub[11]["s"] == 2
    assert sub[100]["n"] == 1 and sub[100]["s"] == 17


def test_exact_max_depth_tree_completes_without_raising(spark):
    """Review finding: a tree whose deepest level is EXACTLY max_depth is
    complete — only a frontier BEYOND max_depth raises."""
    chain = [(1, None, 0)] + [(i, i - 1, 0) for i in range(2, 5)]  # levels 0..3
    got = flatten_hierarchy(_nodes(spark, chain), "id", "parent", max_depth=3)
    assert {r["id"]: r["level"] for r in got.collect()} == {1: 0, 2: 1, 3: 2, 4: 3}
    clo = ancestor_closure(_nodes(spark, chain), "id", "parent", max_depth=3)
    assert clo.count() == 3 + 2 + 1  # full closure of the 4-chain
    with pytest.raises(RuntimeError, match="max_depth"):
        flatten_hierarchy(_nodes(spark, chain), "id", "parent", max_depth=2)
