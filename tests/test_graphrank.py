"""Gates for pagerank (operators/graphrank.py): numpy-reference
parity on a random 200-node weighted graph with dangling nodes, a
hand-checkable hub case, mass conservation, and partition-invariant
determinism."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.graphrank import pagerank  # noqa: E402

DAMPING, ITERS = 0.85, 10


def _numpy_pagerank(edges, n_nodes, damping=DAMPING, iters=ITERS):
    """Reference mirroring the operator exactly (dedup multi-edges by
    summing, uniform dangling redistribution)."""
    w = {}
    for s, d, ww in edges:
        w[(s, d)] = w.get((s, d), 0.0) + ww
    out = {}
    for (s, _), ww in w.items():
        out[s] = out.get(s, 0.0) + ww
    r = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(iters):
        dangling = sum(r[v] for v in range(n_nodes) if v not in out)
        c = np.zeros(n_nodes)
        for (s, d), ww in w.items():
            c[d] += r[s] * ww / out[s]
        r = (1 - damping) / n_nodes + damping * (c + dangling / n_nodes)
    return r


@pytest.fixture(scope="module")
def random_graph():
    rng = np.random.RandomState(42)
    n = 200
    edges = []
    for _ in range(800):
        s, d = rng.randint(0, n), rng.randint(0, n)
        if s != d:
            edges.append((int(s), int(d), float(rng.randint(1, 5))))
    # make nodes 190..199 dangling (strip their out-edges)
    edges = [e for e in edges if e[0] < 190]
    # every node appears (as dst at least)
    for v in range(n):
        edges.append((int(v % 190), int(v), 1.0))
    edges = [e for e in edges if e[0] != e[1]]
    return n, edges


def test_matches_numpy_reference(spark, random_graph):
    n, edges = random_graph
    df = spark.createDataFrame(edges, "src int, dst int, w double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, DAMPING, ITERS, weight="w").collect()
    }
    ref = _numpy_pagerank(edges, n)
    assert len(got) == n
    for v in range(n):
        assert abs(got[v] - ref[v]) < 1e-9, (v, got[v], ref[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_hub_ranks_highest(spark):
    # symmetric star: leaves 1..5 <-> hub 0
    edges = [(i, 0, 1.0) for i in range(1, 6)] + [(0, i, 1.0) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src int, dst int, w double")
    got = {r["node"]: r["rank"] for r in pagerank(df, weight="w").collect()}
    assert got[0] == max(got.values())
    leaf = [got[i] for i in range(1, 6)]
    assert max(leaf) - min(leaf) < 1e-12  # symmetry
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_partition_invariant_determinism(spark, random_graph):
    n, edges = random_graph
    df = spark.createDataFrame(edges, "src int, dst int, w double")
    a = sorted((r["node"], r["rank"]) for r in pagerank(df, weight="w").collect())
    b = sorted(
        (r["node"], r["rank"])
        for r in pagerank(df.repartition(13), weight="w").collect()
    )
    for (na, ra), (nb, rb) in zip(a, b):
        assert na == nb and abs(ra - rb) < 1e-12


def test_empty_edges_raise_cleanly(spark):
    df = spark.createDataFrame([], "src int, dst int, w double")
    with pytest.raises(ValueError):
        pagerank(df, weight="w")


def test_zero_outweight_node_treated_as_dangling(spark):
    # a node whose out-weights sum to 0 used to leak its whole rank
    # (NULL transition fractions, yet counted as having out-edges) —
    # Sum(rank) decayed every iteration; it must behave as dangling
    edges = spark.createDataFrame(
        [("a", "b", 0.0), ("b", "a", 1.0), ("b", "c", 1.0)],
        "src string, dst string, w double",
    )
    ranks = pagerank(edges, iters=10, weight="w")
    total = sum(r["rank"] for r in ranks.collect())
    assert abs(total - 1.0) < 1e-9
