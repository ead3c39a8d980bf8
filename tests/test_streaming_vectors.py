"""Continuous IVF-PQ index maintenance (streaming/vectors.py): the
first drop bootstraps the model, later drops append with the frozen
model; served top-k equals a single-batch index encoding the union
of drops with that same model; checkpoint resume reprocesses nothing;
compaction keeps serving byte-identical."""

from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from nidaba_spark.operators import pq  # noqa: E402
from nidaba_spark.streaming.vectors import vector_index_stream  # noqa: E402

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)
DIM = 64
SF = os.environ.get("NIDABA_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb_rows(spark):
    rows = (
        spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .collect()
    )
    return [(r["vec_id"], list(r["embedding"])) for r in rows]


def _write_drop(spark, src: str, name: str, rows) -> None:
    tmp = src + f"_{name}_tmp"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(tmp, f), os.path.join(src, f"{name}.parquet"))
    shutil.rmtree(tmp)


def _serve(spark, path, queries, vectors, k=5):
    return {
        tuple(r)
        for r in pq.ivfpq_topk_index(
            spark, path, queries, vectors, k=k, nprobe=4, dim=DIM
        ).collect()
    }


def test_stream_bootstrap_append_resume(spark, tmp_path, emb_rows):
    src = str(tmp_path / "drops")
    idx = str(tmp_path / "idx")
    os.makedirs(src)
    half = len(emb_rows) // 2
    d1, d2 = emb_rows[:half], emb_rows[half:]

    # drop 1 bootstraps (trains the model on itself)
    _write_drop(spark, src, "d1", d1)
    vector_index_stream(spark, src, idx, SCHEMA, dim=DIM, nlist=8, iters=2)
    all_vecs = spark.createDataFrame(emb_rows, SCHEMA)
    queries = all_vecs.filter(F.col("vec_id") % 17 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert spark.read.parquet(f"{idx}/coded").count() == len(d1)

    # drop 2 appends with the FROZEN model
    _write_drop(spark, src, "d2", d2)
    vector_index_stream(spark, src, idx, SCHEMA, dim=DIM, nlist=8, iters=2)
    assert spark.read.parquet(f"{idx}/coded").count() == len(emb_rows)
    got = _serve(spark, idx, queries, all_vecs)

    # reference: one batch holding BOTH drops, encoded with the same
    # persisted model
    ref = str(tmp_path / "ref")
    cents, books = pq.load_ivfpq_model(spark, idx)
    os.makedirs(f"{ref}/model", exist_ok=True)
    shutil.copytree(f"{idx}/model", f"{ref}/model", dirs_exist_ok=True)
    pq.encode_pq(all_vecs, books, DIM, "vec_id", "embedding", centroids=cents)\
        .write.mode("overwrite").partitionBy("cell")\
        .parquet(f"{ref}/coded/batch=0")
    assert got == _serve(spark, ref, queries, all_vecs) and got

    # resume with nothing new: checkpoint reprocesses nothing
    vector_index_stream(spark, src, idx, SCHEMA, dim=DIM, nlist=8, iters=2)
    assert spark.read.parquet(f"{idx}/coded").count() == len(emb_rows)
    assert _serve(spark, idx, queries, all_vecs) == got

    # compaction: serving byte-identical, batches folded
    stats = pq.compact_coded(spark, idx)
    assert stats["batches_before"] == 2
    assert _serve(spark, idx, queries, all_vecs) == got


def test_bootstrap_replay_after_partial_model_write(spark, tmp_path, emb_rows):
    """Crash between the centroids and codebooks model writes: the
    replayed batch must re-BOOTSTRAP (build writes codebooks LAST, so
    its absence means the model never committed), not take the append
    path against the half-written model and fail on every retry."""
    src = str(tmp_path / "drops")
    idx = str(tmp_path / "idx")
    os.makedirs(src)
    d1 = emb_rows[: len(emb_rows) // 2]
    _write_drop(spark, src, "d1", d1)
    vector_index_stream(spark, src, idx, SCHEMA, dim=DIM, nlist=8, iters=2)

    # simulate the crash: codebooks (the commit marker) missing, the
    # engine checkpoint never committed -> batch 0 replays
    shutil.rmtree(f"{idx}/model/codebooks")
    shutil.rmtree(f"{idx}/ckpt")
    vector_index_stream(spark, src, idx, SCHEMA, dim=DIM, nlist=8, iters=2)

    assert os.path.isdir(f"{idx}/model/codebooks")
    assert spark.read.parquet(f"{idx}/coded").count() == len(d1)
    all_vecs = spark.createDataFrame(emb_rows, SCHEMA)
    queries = all_vecs.filter(F.col("vec_id") % 17 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert _serve(spark, idx, queries, all_vecs)
