"""Streaming extraction: the fused pipeline as a Structured Streaming
job over a crawl drop folder.

Continuous-ingestion shape of the batch ``pipeline.extract``: new page
parquet files landing in a directory are picked up per micro-batch,
run through the SAME fused parse stage (decode+segment+classify+merge
in one Arrow-batched pass, ``operators/fused.py``), and appended
exactly-once to the extracted table. Resumability comes from the
engine itself — the checkpointLocation's offset/commit log means a
killed job relaunched with the same checkpoint reprocesses nothing
and misses nothing, which is the streaming twin of the batch
Pipeline's manifest/attempt machinery.

Plan notes (scale):

  * Two modes (VERDICT r04 next #9):
    ``mode='inline'`` (default) streams the ``fused_inline`` variant
    (text column carried through) straight into the parquet sink —
    the engine cannot run the batch path's two-phase text-pruned plan
    directly because that plan localCheckpoints + self-unions, a
    batch-only materialization Structured Streaming forbids per
    epoch. Inline keeps the stream single-pass; the ~46% extra Arrow
    bytes are per-micro-batch, bounded by maxFilesPerTrigger, not
    corpus-sized.
    ``mode='pruned'`` runs the FULL two-phase text-pruned batch plan
    INSIDE foreachBatch — each micro-batch is a static DataFrame
    there, so the localCheckpoint/self-union is legal — and writes an
    idempotent batch_id-keyed partition overwrite (the
    streaming/dedup.py convergence contract replaces the parquet
    sink's commit log). Measured A/B at realistic 25k-page drops,
    local[32] (NOTES r05): inline 4.6-5.2s vs pruned 7.2-14.2s per
    drain — the pruned plan's per-batch fixed costs (checkpoint
    materialization, fallback join, extra stage barriers) dominate
    its Arrow-byte savings at drop granularity, so INLINE stays the
    default; 'pruned' is the right mode only when drops are huge
    enough to approach the batch regime (where the same plan wins
    3/3 paired 8v32 efficiency samples, NOTES r03) or when the
    fabric between stages charges for bytes.
  * ``repartition(n, length_bucket, salt)`` (prepare()) works
    per-micro-batch: each batch gets the same skew-salting as the
    batch job, so a mega-page-heavy drop file cannot stall one task.
  * Exactly-once: file-source offsets + parquet-sink commit protocol
    (inline) / batch_id-partition overwrite (pruned); the equivalence
    tests replay a second drop against the same checkpoint and assert
    no dupes, no gaps, bytes identical to the batch extract over the
    union of both drops — for BOTH modes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import schemas
from ..pipeline import prepare
from .events import _raise_progress_retention, append_stream_lineage


def extract_pages_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    nsalt: int = 256,
    npartitions: int | None = None,
    max_files_per_trigger: int | None = None,
    lineage_dir: str | None = None,
    run_id: str = "stream",
    available_now: bool = True,
    mode: str = "inline",
):
    """Run (or resume) the streaming extract. Blocks until the
    available data is drained when ``available_now`` (the test/batch-
    catchup trigger); pass ``available_now=False`` for a continuous
    job and manage the returned query yourself.

    ``mode='inline'`` — single-pass fused stage → parquet sink;
    ``mode='pruned'`` — the two-phase text-pruned batch plan per
    micro-batch via foreachBatch (see module docstring).

    Returns the finished (or running) StreamingQuery.
    """
    if mode not in ("inline", "pruned"):
        raise ValueError(f"unknown mode {mode!r}")
    reader = spark.readStream.schema(schemas.PAGES)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(source_dir)

    if mode == "inline":
        from ..operators.fused import fused_extract_stage

        ext = fused_extract_stage(
            prepare(
                pages.select("url", "warc_ts", "html", "lang", "text"),
                nsalt,
                npartitions,
            )
        )
        writer = (
            ext.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
        )
    else:
        from .. import pipeline as _pipeline

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            # the full two-phase plan is legal here: batch_df is
            # static inside foreachBatch, so the localCheckpoint +
            # self-union the streaming engine forbids per-epoch is
            # just the normal batch plan. Exactly-once comes from the
            # batch_id-keyed OVERWRITE: a crash-replayed micro-batch
            # rewrites its own subdirectory and converges.
            _pipeline.extract(
                batch_df.select("url", "warc_ts", "html", "lang", "text"),
                nsalt=nsalt,
                npartitions=npartitions,
                mode="fused",
            ).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={batch_id}")
            )

        writer = (
            pages.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
        )
    if available_now:
        writer = writer.trigger(availableNow=True)
    _raise_progress_retention(spark)
    q = writer.start()
    if available_now:
        q.awaitTermination()
        append_stream_lineage(
            spark, q, lineage_dir, run_id=run_id, stage="stream_extract"
        )
    return q


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    """The extracted table the stream maintains (empty-safe; handles
    both the flat inline-sink layout and the pruned mode's batch=N
    partition subdirectories, whose discovered partition column is
    projected away). Existence is probed through Spark's Hadoop FS
    layer — driver-local os.path.isdir is False for any hdfs://-or-
    s3a:// out_dir and would silently return an EMPTY corpus where
    the real table has data (review r05)."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(out_dir)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return spark.createDataFrame([], schemas.EXTRACTED)
    cols = [f.name for f in schemas.EXTRACTED.fields]
    return spark.read.parquet(out_dir).select(*cols)
