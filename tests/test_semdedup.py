"""SemDeDup (operators/semdedup.py): nlist=1 degenerates exactly to
the oracle-checked brute-force pair set; planted clusters resolve to
the right duplicate groups with min-id reps; deterministic under
repartitioning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nidaba_spark.operators import similarity
from nidaba_spark.operators.semdedup import semdedup, semdedup_pairs

SF_DIR = os.environ.get("NIDABA_TEST_SF", "/root/testdata/sf0.001")
T = 0.9


@pytest.fixture(scope="module")
def clustered(spark):
    from nidaba_spark.plans.trainingdata import clustered_embeddings

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    # 100 vectors / 20 planted clusters keeps the nlist=1 brute-force
    # leg (n^2 pairs) cheap while every cluster keeps 5 members
    return clustered_embeddings(emb).filter(F.col("vec_id") < 100).cache()


def test_nlist1_equals_brute_force(spark, clustered):
    """One cell = no pruning: the within-cell pair set must equal the
    brute-force near_dup_pairs set bit for bit (same rounded sims)."""
    got = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in semdedup_pairs(clustered, nlist=1, threshold=T, iters=1).collect()
    }
    exact = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in similarity.near_dup_pairs(clustered, threshold=T, dim=64).collect()
    }
    assert got == exact and got


def test_planted_groups_resolve_with_min_id_reps(spark, clustered):
    """At nlist=4, k-means cells are coarser than the 20 planted
    clusters, but a boundary member CAN land in a different cell (the
    paper's accepted approximation — measured here: 1 of 100). The
    invariants: no false merges (everything grouped with rep shares
    its planted cluster — precision 1.0) and >= 95% of vectors resolve
    to their planted cluster's min id."""
    rows = semdedup(clustered, nlist=4, threshold=T).collect()
    got = {r["vec_id"]: r["rep"] for r in rows}
    assert all(v % 20 == r % 20 for v, r in got.items())  # precision
    hits = sum(1 for i in range(100) if got.get(i) == i % 20)
    assert hits >= 95


def test_pair_recall_vs_brute_force_at_nlist4(spark, clustered):
    """Within-cell pairs are a SUBSET of the brute-force truth (the
    pruning can only lose pairs, never invent them) with recall >=
    0.95 on the planted-cluster corpus."""
    got = {
        (r["id_a"], r["id_b"])
        for r in semdedup_pairs(clustered, nlist=4, threshold=T).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.near_dup_pairs(clustered, threshold=T, dim=64).collect()
    }
    assert got <= exact
    assert len(got) / len(exact) >= 0.95


def test_partitioning_invariance(spark, clustered):
    a = {tuple(r) for r in semdedup(clustered, nlist=4, threshold=T).collect()}
    b = {
        tuple(r)
        for r in semdedup(clustered.repartition(7), nlist=4, threshold=T).collect()
    }
    assert a == b
