"""Unit invariants for the iterative graph operators
(operators/traverse.py) beyond the oracle-parity coverage of
j9_transitive_closure / x4b_hed_ancestors."""

from __future__ import annotations

import pytest

from loris_mri_spark.operators.traverse import ancestor_closure, transitive_closure


def test_ancestor_closure_paths_and_distances(spark):
    #      1
    #     / \
    #    2   3
    #    |
    #    4        5 (root, isolated)
    nodes = spark.createDataFrame(
        [(1, None), (2, 1), (3, 1), (4, 2), (5, None)],
        "node_id int, parent_id int",
    )
    got = {
        (r["node_id"], r["ancestor_id"], r["dist"])
        for r in ancestor_closure(nodes).collect()
    }
    assert got == {(2, 1, 1), (3, 1, 1), (4, 2, 1), (4, 1, 2)}


def test_ancestor_closure_raises_on_parent_cycle(spark):
    nodes = spark.createDataFrame(
        [(1, 2), (2, 1)], "node_id int, parent_id int"
    )
    with pytest.raises(RuntimeError, match="did not drain"):
        ancestor_closure(nodes, max_iterations=5).collect()


def test_transitive_closure_reaches_and_stops(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src int, dst int"
    )
    seeds = spark.createDataFrame([(1,)], "id int")
    got = {r["id"] for r in transitive_closure(edges, seeds).collect()}
    assert got == {1, 2, 3}
