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
    dst = os.path.join(src, os.path.basename(source_path))
    # lexists guard: resuming a stream on the same work_dir (the
    # documented checkpoint-resume pattern) re-stages the same file —
    # an unconditional symlink would crash with FileExistsError
    if not os.path.lexists(dst):
        os.symlink(os.path.abspath(source_path), dst)
    return src


def _raise_progress_retention(spark: SparkSession, n: int = 10000) -> None:
    """recentProgress is capped (spark.sql.streaming.
    numRecentProgressUpdates, default 100), so an availableNow
    catch-up drain with >100 micro-batches would silently lose the
    oldest batches' lineage rows. Raise the cap BEFORE the query
    starts; each retained entry is one small progress dict on the
    driver."""
    cur = int(
        spark.conf.get("spark.sql.streaming.numRecentProgressUpdates", "100")
    )
    if cur < n:
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", str(n))


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
    cap = int(
        spark.conf.get("spark.sql.streaming.numRecentProgressUpdates", "100")
    )
    progress = query.recentProgress
    if len(progress) >= cap:
        print(
            f"WARNING: recentProgress hit its retention cap ({cap}); "
            "lineage rows for the oldest micro-batches were dropped — "
            "raise spark.sql.streaming.numRecentProgressUpdates before "
            "starting the query (_raise_progress_retention)."
        )
    rows = []
    for p in progress:
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
    _raise_progress_retention(spark)
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
        # rename-aside install, NOT delete-then-rename: a crash
        # between rmtree(target) and rename(tmp) would lose the whole
        # upsert history with no replay recovery (the batch replays,
        # sees no target, and rebuilds from the current batch alone) —
        # the same crash window links.compact_edges closed. Here the
        # old table is renamed aside before the install and restored
        # at entry if a previous attempt died mid-swap.
        batch_df = batch_df.dropDuplicates([key])  # within-batch
        old = target + ".old"
        if not os.path.isdir(target) and os.path.isdir(old):
            os.rename(old, target)  # recover a died-mid-swap attempt
        if os.path.isdir(target):
            existing = batch_df.sparkSession.read.schema(schema).parquet(target)
            merged = existing.join(batch_df, key, "left_anti").unionByName(batch_df)
        else:
            merged = batch_df
        tmp = target + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write.mode("overwrite").parquet(tmp)  # reads target HERE
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(target):
            os.rename(target, old)
        os.rename(tmp, target)
        shutil.rmtree(old, ignore_errors=True)

    _raise_progress_retention(spark)
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
