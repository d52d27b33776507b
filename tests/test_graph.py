"""Connected components over dup pairs (operators/graph.py).

Correctness oracle: a plain Python union-find over the same edge list —
the Spark alternating-star result must agree on every node's component
representative (the component MIN), for random graphs, long chains
(diameter >> log n, the case that breaks naive label propagation budgets),
and star/clique mixes.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.operators import graph


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _assert_matches(spark, edges: list[tuple[int, int]]):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r.node, r.comp)
        for r in graph.connected_components(df).collect()
    }
    want = set(_uf_components(edges).items())
    assert got == want


def test_two_triangles_and_isolated_pair(spark):
    _assert_matches(
        spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (20, 21)]
    )


def test_long_chain_diameter(spark):
    # a 60-node path: diameter 59 >> the O(log^2 n) star rounds — naive
    # min-propagation would need 59 joins; alternating star must converge
    # well under the max_iter=50 budget
    edges = [(i, i + 1) for i in range(100, 160)]
    _assert_matches(spark, edges)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(150)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _assert_matches(spark, edges)


def test_duplicate_and_reversed_edges_are_harmless(spark):
    _assert_matches(spark, [(1, 2), (2, 1), (1, 2), (2, 3), (3, 2)])


def test_dup_clusters_representative_and_size(spark):
    df = spark.createDataFrame(
        [(5, 6), (6, 7), (30, 31)], "id_a long, id_b long"
    )
    rows = {r.node: r for r in graph.dup_clusters(df).collect()}
    assert rows[5].comp == 5 and rows[5].is_representative
    assert rows[6].comp == 5 and not rows[6].is_representative
    assert rows[7].cluster_size == 3
    assert rows[30].is_representative and rows[31].cluster_size == 2


def test_dedup_by_clusters_keeps_min_and_untouched_rows(spark):
    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id").withColumn(
        "text", F.concat(F.lit("d"), F.col("doc_id"))
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in graph.dedup_by_clusters(docs, pairs).collect()
    )
    # clusters {1,2,3} -> keep 1; {7,8} -> keep 7; others untouched
    assert kept == [0, 1, 4, 5, 6, 7, 9]


def test_bridge_node_does_not_split_component(spark):
    # regression: {5-6, 5-7, 1-6, 2-7} flattens after one star round to
    # {(5,1),(5,2),(6,1),(7,2)} — flat (no parent is a child) but node 5
    # keeps TWO parents, i.e. roots 1 and 2 are still bridged. The old
    # flatness-only convergence check stopped here and split the single
    # true component {1,2,5,6,7} into {1,5,6} and {2,5,7} (node 5 in both).
    _assert_matches(spark, [(5, 6), (5, 7), (1, 6), (2, 7)])


def test_sparse_tree_graphs_match_union_find(spark):
    # sparse trees maximize the chance of flat-but-multi-parent interim
    # states (dense graphs merge labels fast); random forests over a small
    # id space stress the convergence check rather than the merge path
    rng = random.Random(13)
    for trial in range(3):
        n = 80
        nodes = list(range(n))
        rng.shuffle(nodes)
        edges = [
            (nodes[i], nodes[rng.randrange(0, i)])
            for i in range(1, n)
            if rng.random() < 0.7  # drop some edges -> forest, not one tree
        ]
        _assert_matches(spark, edges)


def test_non_convergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="no convergence"):
        graph.connected_components(df, max_iter=1)
