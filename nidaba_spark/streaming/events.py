"""Structured Streaming ingest (SURVEY.md §2B B45–B50).

The web-scale story: incremental crawl ingest — new WARC drops land as
files, `readStream` picks them up, watermarked stateful dedup
guarantees exactly-once per url/event, `availableNow` triggers batch
catch-up runs, and the sink append is atomic per micro-batch. The
sandbox exercises the same code path on the events table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_stream_dir(source_path: str, work_dir: str) -> str:
    """The file stream source requires a directory; stage single parquet
    files into one (the 'crawl drop folder' shape a cluster would use)."""
    if os.path.isdir(source_path):
        return source_path
    src = os.path.join(work_dir, "src")
    os.makedirs(src, exist_ok=True)
    os.symlink(os.path.abspath(source_path), os.path.join(src, os.path.basename(source_path)))
    return src


def append_stream_lineage(
    spark: SparkSession,
    query,
    lineage_dir: str | None,
    run_id: str = "stream",
    stage: str = "stream_ingest",
) -> int:
    """Per-micro-batch lineage rows for a finished/running streaming
    query, written through the SAME ``_lineage`` table schema the batch
    Pipeline uses (VERDICT r03 next #8) — so one
    ``Pipeline.lineage()`` read covers batch stages AND stream
    batches. Metrics come from the query's progress log
    (``q.recentProgress`` — the engine's own per-batch accounting), so
    the exactly-once parquet sink is untouched; partition_id carries
    the micro-batch id, bytes_* are -1 (the progress log reports rows,
    not bytes). Returns the number of lineage rows written."""
    import datetime as dt

    from .. import schemas

    if not lineage_dir:
        return 0
    rows = []
    for p in query.recentProgress:
        started = dt.datetime.fromisoformat(p["timestamp"].replace("Z", "+00:00"))
        dur_ms = (p.get("durationMs") or {}).get("triggerExecution", 0) or 0
        finished = started + dt.timedelta(milliseconds=int(dur_ms))
        n_in = int(p.get("numInputRows") or 0)
        sink_rows = (p.get("sink") or {}).get("numOutputRows", -1)
        n_out = int(sink_rows) if sink_rows is not None and int(sink_rows) >= 0 else n_in
        rows.append(
            (run_id, stage, int(p["batchId"]), n_in, n_out, -1, -1,
             started, finished, 1, "ok")
        )
    if rows:
        os.makedirs(lineage_dir, exist_ok=True)
        spark.createDataFrame(rows, schemas.LINEAGE).coalesce(1).write.mode(
            "append"
        ).parquet(lineage_dir)
    return len(rows)


def ingest_events_stream(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    work_dir: str,
    watermark: str = "10 minutes",
    lineage_dir: str | None = None,
    run_id: str = "stream",
) -> str:
    """readStream(parquet) → watermark → stateful dedup → parquet sink.

    Returns the output directory. Uses trigger(availableNow=True) so
    the call is a bounded catch-up run (the batch-mode stand-in for a
    continuous cluster job). With ``lineage_dir`` set, per-micro-batch
    lineage rows are appended after termination (append_stream_lineage).
    """
    out_dir = os.path.join(work_dir, "out")
    ckpt = os.path.join(work_dir, "ckpt")
    source_path = _as_stream_dir(source_path, work_dir)
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    append_stream_lineage(spark, q, lineage_dir, run_id, "stream_ingest")
    return out_dir


def foreach_batch_upsert(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    work_dir: str,
    key: str = "event_id",
    lineage_dir: str | None = None,
    run_id: str = "stream",
) -> str:
    """Stream → foreachBatch keyed upsert into a parquet "table"
    (SURVEY.md §2B B50 — the Iceberg MERGE INTO stand-in; on a cluster
    the body becomes ``target.merge(batch_df, ...)`` on an Iceberg
    table). Returns the target directory."""
    import shutil

    target = os.path.join(work_dir, "target")
    ckpt = os.path.join(work_dir, "ckpt_fb")
    source_path = _as_stream_dir(source_path, work_dir)

    def upsert(batch_df, batch_id: int) -> None:
        batch_df = batch_df.dropDuplicates([key])  # within-batch
        if os.path.isdir(target):
            existing = batch_df.sparkSession.read.schema(schema).parquet(target)
            merged = existing.join(batch_df, key, "left_anti").unionByName(batch_df)
        else:
            merged = batch_df
        tmp = target + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(target, ignore_errors=True)
        os.rename(tmp, target)

    q = (
        spark.readStream.schema(schema)
        .parquet(source_path)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    append_stream_lineage(spark, q, lineage_dir, run_id, "stream_upsert")
    return target


def hourly_event_counts_stream(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    work_dir: str,
) -> DataFrame:
    """Tumbling-window aggregation in the stream itself (B47), complete
    mode into a memory sink — used by tests to exercise windowed
    stateful aggregation (the driver-checked query uses the
    ingest-then-batch-rollup path instead)."""
    name = "hourly_counts_" + os.path.basename(work_dir).replace("-", "_")
    source_path = _as_stream_dir(source_path, work_dir)
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_path)
        .withColumn("ts_tz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_tz", "10 minutes")
        .groupBy(F.window("ts_tz", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")
