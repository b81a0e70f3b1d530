"""Connected-component resolution over near-dup pair edges.

Pair miners (MinHash/LSH q32, PPJoin q38, SimHash q33, embedding-cosine q34)
emit EDGES; deduplication needs CLUSTERS — transitively closed groups with
one canonical survivor each. This is min-label propagation, the standard
distributed connected-components scheme (the simplified form of the
large-star/small-star algorithm from Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14):

* every node starts labeled with itself;
* each round, every node adopts the minimum label in its closed neighborhood
  (one groupBy over the symmetrized edge list);
* stop when a round changes no label.

Rounds are bounded by the component diameter — near-dup clusters are
shallow (dozens of docs, diameter ≲ 5), so the loop runs 2–4 rounds at any
corpus size; each round is one shuffle of the (node, label) table, never
O(edges²). Lineage is cut per round with localCheckpoint (an iterative
driver loop otherwise re-executes every prior round per action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 20,
) -> DataFrame:
    """Resolve undirected ``edges`` into components.

    Returns (node, component) where ``component`` is the minimum node id
    reachable from ``node``. Nodes appearing only as edge endpoints are
    included; isolated nodes (no edges) are the caller's to union in.

    Raises ``RuntimeError`` if labels have not converged after ``max_iter``
    propagation rounds — returning partially-propagated labels would
    silently split clusters, which a dedup pipeline translates into kept
    duplicates. ``max_iter`` is the component-diameter bound; convergence
    is only OBSERVABLE on the following no-change round, so the loop runs
    up to ``max_iter + 1`` times internally — callers size the bound to
    the diameter and never pay a spurious failure for an exactly-diameter
    component. Hitting the bound means the edge set is not the shallow
    near-dup topology this operator is sized for (raise ``max_iter``, or
    pre-contract the graph)."""
    sym = edges.select(
        F.col(src).alias("n"), F.col(dst).alias("m")
    ).unionByName(edges.select(F.col(dst).alias("n"), F.col(src).alias("m")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("n").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    ).localCheckpoint(eager=True)

    converged = False
    # +1: the last label change can legitimately land in round max_iter;
    # the zero-change round that PROVES convergence is one later
    for _ in range(max_iter + 1):
        # min label over the closed neighborhood: own label ∪ neighbors'
        neighbor_best = (
            sym.join(labels, sym["m"] == labels["node"], "inner")
            .select(sym["n"].alias("node"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(neighbor_best)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("component", "new_component")
            .join(labels, "node")
            .where(F.col("new_component") != F.col("component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; partially-propagated labels would silently split clusters"
        )
    return labels.select(F.col("node").alias("n"), F.col("component"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    d1: str = "d1",
    d2: str = "d2",
) -> DataFrame:
    """Full-corpus cluster assignment from near-dup pairs.

    Every document gets (cluster_id = min reachable doc id, is_canonical);
    documents in no pair are their own singleton cluster. This is the
    keep-one-per-cluster step a 100 TB dedup pipeline runs after pair
    mining; the docs side is touched by exactly one left join.
    """
    comp = connected_components(pairs, d1, d2)
    return (
        docs.select(F.col(id_col))
        .join(comp, docs[id_col] == comp["n"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", (F.col(id_col) == F.col("cluster_id")))
    )
