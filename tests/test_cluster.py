"""Connected-components duplicate clustering (operators/cluster.py).

Pins the large-star/small-star implementation against a plain
union-find computed in-test (the obviously-correct sequential
algorithm), on hand graphs and on a seeded random graph, plus
determinism under repartitioning.
"""

from __future__ import annotations

import random

import pytest

from nidaba_spark.operators.cluster import connected_components, dedup_clusters


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _spark_cc(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {r["node"]: r["rep"] for r in connected_components(df).collect()}


def test_cc_hand_graphs(spark):
    # chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), isolated pair
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    got = _spark_cc(spark, pairs)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_long_path_and_reversed_ids(spark):
    # worst diameter shape for label propagation; ids descending so the
    # min sits at the FAR end from most nodes
    n = 40
    pairs = [(i + 1, i) for i in range(1, n)]
    got = _spark_cc(spark, pairs)
    assert got == {i: 1 for i in range(1, n + 1)}


def test_cc_matches_union_find_random(spark):
    rng = random.Random(42)
    nodes = list(range(1, 300))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(250)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    expect = _union_find(pairs)
    got = _spark_cc(spark, pairs)
    assert got == expect


def test_cc_deterministic_under_partitioning(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(1, 200), rng.randrange(1, 200)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df1 = spark.createDataFrame(pairs, "id_a long, id_b long").repartition(1)
    df17 = spark.createDataFrame(pairs, "id_a long, id_b long").repartition(17)
    r1 = {(r["node"], r["rep"]) for r in connected_components(df1).collect()}
    r17 = {(r["node"], r["rep"]) for r in connected_components(df17).collect()}
    assert r1 == r17


def test_dedup_clusters_rollup(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 9), (9, 5)], "id_a long, id_b long"
    )
    rows = {r["rep"]: r for r in dedup_clusters(df).collect()}
    assert set(rows) == {1, 5}
    assert rows[1]["cluster_size"] == 3
    assert rows[1]["members"] == [1, 2, 3]
    assert rows[5]["cluster_size"] == 2
    assert rows[5]["members"] == [5, 9]


def test_cc_raises_without_fixpoint_budget(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, max_iter=0)
