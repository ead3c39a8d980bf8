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

  * The stream uses the ``fused_inline`` variant (text column carried
    through). The batch path's two-phase text-pruned plan needs a
    localCheckpoint + self-union of one micro-batch — a batch-only
    materialization Structured Streaming forbids (two sinks / reused
    subplan per epoch). Inline keeps the stream single-pass; the ~46%
    extra Arrow bytes are per-micro-batch, bounded by
    maxFilesPerTrigger, not corpus-sized.
  * ``repartition(n, length_bucket, salt)`` (prepare()) works
    per-micro-batch: each batch gets the same skew-salting as the
    batch job, so a mega-page-heavy drop file cannot stall one task.
  * Exactly-once: file-source offsets + parquet-sink commit protocol;
    the equivalence test replays a second drop against the same
    checkpoint and asserts no dupes, no gaps, bytes identical to the
    batch extract over the union of both drops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import schemas
from ..pipeline import prepare
from .events import append_stream_lineage


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
):
    """Run (or resume) the streaming extract. Blocks until the
    available data is drained when ``available_now`` (the test/batch-
    catchup trigger); pass ``available_now=False`` for a continuous
    job and manage the returned query yourself.

    Returns the finished (or running) StreamingQuery.
    """
    reader = spark.readStream.schema(schemas.PAGES)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(source_dir)

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
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
        append_stream_lineage(
            spark, q, lineage_dir, run_id=run_id, stage="stream_extract"
        )
    return q


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    """The extracted table the stream maintains (empty-safe)."""
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], schemas.EXTRACTED)
    return spark.read.schema(schemas.EXTRACTED).parquet(out_dir)
