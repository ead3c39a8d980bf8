"""Acceptance gates for the IVF ANN path (operators/ivf.py).

Same philosophy as test_lsh_recall.py — convert "runs" into
"measured correct":

  * exhaustive-probe equality: with nprobe = nlist every cell is
    scanned, so IVF must return EXACTLY the brute-force answer (same
    ids, sims, ranks) — pins assignment/probe/re-rank correctness
    independent of centroid quality.
  * planted-cluster recall: on the clustered fixture (20 planted
    centroids) a partial probe must still recover >= RECALL_FLOOR of
    the exact top-k — pins that training actually finds the cluster
    structure.
  * determinism: two independently-trained runs return identical
    rows (seeded hash init + fixed iters + rounded centroids).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nidaba_spark.operators import ivf, similarity

SF_DIR = os.environ.get("NIDABA_TEST_SF", "/root/testdata/sf0.001")

RECALL_FLOOR = 0.90
N_QUERIES = 10
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    return df.select("vec_id", "embedding")


@pytest.fixture(scope="module")
def clustered(spark, emb):
    from nidaba_spark.plans.trainingdata import clustered_embeddings

    return clustered_embeddings(emb).cache()


def _queries(df):
    return df.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _hits(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_exhaustive_probe_equals_brute_force(spark, emb):
    """nprobe == nlist scans every cell -> must equal exact top-k."""
    q = _queries(emb)
    exact = similarity.brute_force_topk(emb, q, k=K, dim=64).collect()
    approx = ivf.ivf_topk(
        emb, q, k=K, nlist=8, nprobe=8, iters=2, dim=64
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(
        [(r["query_id"], r["vec_id"], r["sim"], r["rank"]) for r in exact]
    ) == sorted(
        [(r["query_id"], r["vec_id"], r["sim"], r["rank"]) for r in approx]
    )


def test_planted_cluster_recall(spark, clustered):
    """Partial probe (4 of 24 cells) on the 20-cluster fixture."""
    q = _queries(clustered)
    exact = _hits(
        similarity.brute_force_topk(clustered, q, k=K, dim=64).collect()
    )
    approx = _hits(
        ivf.ivf_topk(
            clustered, q, k=K, nlist=24, nprobe=4, iters=3, dim=64
        ).collect()
    )
    got = sum(len(exact[qid] & approx.get(qid, set())) for qid in exact)
    want = sum(len(v) for v in exact.values())
    recall = got / want
    assert recall >= RECALL_FLOOR, f"IVF recall {recall:.3f} < {RECALL_FLOOR}"


def test_training_is_deterministic(spark, emb):
    c1 = ivf.train_centroids(emb, nlist=8, dim=64, iters=2)
    c2 = ivf.train_centroids(emb, nlist=8, dim=64, iters=2)
    assert (c1 == c2).all()

    q = _queries(emb)
    r1 = ivf.ivf_topk(emb, q, k=K, nlist=8, nprobe=2, iters=2, dim=64).collect()
    r2 = ivf.ivf_topk(emb, q, k=K, nlist=8, nprobe=2, iters=2, dim=64).collect()
    as_set = lambda rows: {
        (r["query_id"], r["vec_id"], r["sim"], r["rank"]) for r in rows
    }
    assert as_set(r1) == as_set(r2)


def test_null_embedding_safe(spark, emb):
    """A null embedding must not crash assignment (zero-row cosine)."""
    with_null = emb.limit(50).union(
        spark.createDataFrame(
            [(999999, None)], schema="vec_id long, embedding array<float>"
        )
    )
    cents = ivf.train_centroids(with_null.filter(F.col("embedding").isNotNull()),
                                nlist=4, dim=64, iters=1)
    assigned = with_null.select(
        ivf._assign_udf(cents, 64)("embedding").alias("cell")
    ).collect()
    assert len(assigned) == 51
