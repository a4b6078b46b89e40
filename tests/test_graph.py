"""Connected-components operator (operators/graph.py)."""

from __future__ import annotations

import pytest

from quantlab_data_pipeline_spark.operators.graph import (
    connected_components,
    dedup_cluster_assignments,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_components_chain_and_star(spark):
    # chain 1-2-3-4 (diameter > 1: exercises multi-iteration
    # propagation), star 10-{11,12,13}, and a 2-cycle 20-21
    edges = _edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
    )
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20}


def test_components_direction_independent(spark):
    # min id on the "wrong" side of every edge: propagation must flow
    # against edge direction too (symmetrized edge list)
    got = {
        r["node"]: r["component"]
        for r in connected_components(_edges(spark, [(5, 1), (5, 3)])).collect()
    }
    assert got == {1: 1, 3: 1, 5: 1}


def test_components_long_chain_converges(spark):
    # 12-node chain with ids descending: worst case for min-label
    # (label must walk the full diameter)
    n = 12
    edges = _edges(spark, [(i, i + 1) for i in range(1, n)])
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert set(got.values()) == {1}


def test_non_convergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_edges(spark, [(i, i + 1) for i in range(1, 9)]),
                             max_iters=2)


def test_cluster_assignments_keeper_policy(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 7, 9)], "doc_id long, text string"
    )
    pairs = _edges(spark, [(1, 2), (2, 3)])
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in dedup_cluster_assignments(docs, pairs).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        7: (7, True), 9: (9, True),  # singletons are their own keepers
    }
