"""Feature-hashed embeddings (operators/hashvec): unit norm,
zero-token docs, near-dup cosine separation, and composition with the
embedding consumers (ICLM packing). Full DuckDB oracle parity for
q_hashed_embedding runs in tests/test_offdriver_oracles.py.
"""

from __future__ import annotations

import os
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.hashvec import hashed_tf_embedding  # noqa: E402


def _vecs(df):
    return {
        r["doc_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in df.collect()
    }


def test_unit_norm_and_zero_doc(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "...!!!"), (3, "")],
        "doc_id long, text string",
    )
    v = _vecs(hashed_tf_embedding(docs, dim=32))
    assert abs(np.linalg.norm(v[1]) - 1.0) < 1e-4
    assert np.all(v[2] == 0.0) and np.all(v[3] == 0.0)


def test_near_dup_cosine_separation(spark):
    base = "spark shuffles the hashed partitions across the cluster nodes"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " quickly"),  # near-dup
            (3, "violets are blue and roses are red in the garden"),
        ],
        "doc_id long, text string",
    )
    v = _vecs(hashed_tf_embedding(docs, dim=64))
    near = float(v[1] @ v[2])
    far = float(v[1] @ v[3])
    assert near > 0.9, near
    assert far < 0.5, far
    assert near > far + 0.4


def test_deterministic_and_partitioning_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = hashed_tf_embedding(docs, dim=16)
    b = hashed_tf_embedding(docs.repartition(13), dim=16)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_composes_with_iclm_pack(spark):
    """The model-free bridge: text-only corpus → hashed vectors →
    semantic packing, no embedding column anywhere upstream."""
    from nidaba_spark.operators.iclm import iclm_pack

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    emb = hashed_tf_embedding(docs, dim=16)
    joined = docs.select("doc_id", "n_chars").join(emb, "doc_id")
    out = iclm_pack(
        joined,
        (F.col("n_chars") / 4).cast("long"),
        2000,
        nlist=4,
        dim=16,
        id_col="doc_id",
        vec_id_col="doc_id",
        vec_col="embedding",
    )
    assert out.count() == 200
    assert out.select("doc_id").distinct().count() == 200


def test_plan_single_doc_keyed_shuffle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        hashed_tf_embedding(docs, dim=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # map-side partial agg before the doc-keyed exchange, no Python
    assert "partial" in plan.lower()
    assert "Python" not in plan
