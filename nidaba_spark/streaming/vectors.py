"""Continuous vector-index maintenance: a Structured Streaming job
that folds each arriving drop of embeddings into the persisted IVF-PQ
index (operators/pq.py) — the ANN serving path stays current as the
crawl's embedding pipeline produces new vectors, and historical
vectors are NEVER re-encoded.

Bootstrap-then-append: the FIRST drop trains the coarse quantizer +
codebooks and writes its coded rows under its own micro-batch id
(build_ivfpq_index); every later drop is encoded with that persisted
model into its own ``coded/batch=N`` (append_ivfpq). Freezing the model at bootstrap is
the standard IVF practice (FAISS trains on a sample, then adds) and
is what keeps historical codes comparable; when the embedding
distribution drifts, rebuild offline and swap. Training is
seed-deterministic, so even a crash-replayed batch 0 converges to
identical model AND coded bytes.

Exactly-once: file-source checkpoint + batch_id-keyed partition
overwrites (the streaming/dedup.py contract) — a replayed batch
rewrites its own subdirectory to the same bytes. Queries serve from
``pq.ivfpq_topk_index``, which reads probed cells ACROSS all batch
subdirectories; ``pq.compact_coded`` folds them when the file count
grows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _model_exists(spark: SparkSession, index_path: str) -> bool:
    # Probe the LAST artifact build_ivfpq_index writes (codebooks), not
    # the first: a crash between the centroids and codebooks writes
    # must replay as a REBUILD, not as an append against a half-written
    # model (which would fail reading codebooks on every retry).
    sc = spark.sparkContext
    Path = sc._jvm.org.apache.hadoop.fs.Path
    p = Path(os.path.join(index_path, "model", "codebooks"))
    return p.getFileSystem(sc._jsc.hadoopConfiguration()).exists(p)


def vector_index_stream(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    schema,
    dim: int = 64,
    nlist: int = 16,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int | None = None,
):
    """Drain all available embedding drops from ``source_dir``
    (availableNow), maintaining the IVF-PQ index at ``index_path``.
    Returns the finished StreamingQuery; re-running with the same
    ``index_path`` resumes from the checkpoint and touches only new
    drops. Vector ids must be unique across drops (upstream dedup
    owns that, as everywhere in this repo's index family)."""
    ckpt = os.path.join(index_path, "ckpt")

    from ..operators.pq import append_ivfpq, build_ivfpq_index

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if not _model_exists(spark, index_path):
            # bootstrap: train on this drop; coded rows keyed by the
            # REAL micro-batch id so a replay converges in place
            build_ivfpq_index(
                batch_df, index_path, nlist=nlist, m=m, ksub=ksub,
                dim=dim, iters=iters, id_col=id_col, vec_col=vec_col,
                batch_id=batch_id,
            )
        else:
            append_ivfpq(
                batch_df, index_path, batch_id=batch_id, dim=dim,
                id_col=id_col, vec_col=vec_col,
            )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
