"""Watermark late-data semantics (SURVEY.md §2B B46, FIXTURES.md §3):
a row whose window was already finalized by the watermark in an
earlier micro-batch is dropped from windowed aggregation."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def batch_dir(spark, tmp_path):
    """Four files = four micro-batches (maxFilesPerTrigger=1, ordered by
    mtime): events at 10:00-10:50, then 12:00 (advances the watermark to
    11:50, past the [10:00,11:00) window end), then 12:30 (the batch in
    which that window is evicted/emitted), then a LATE 10:05 row."""
    batches = [
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:30:00"), (3, "2024-01-01 10:50:00")],
        [(4, "2024-01-01 12:00:00")],
        [(6, "2024-01-01 12:30:00")],
        [(5, "2024-01-01 10:05:00")],  # late: window already finalized
    ]
    src = tmp_path / "src"
    src.mkdir()
    now = time.time()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, ["event_id", "ts_str"]).select(
            "event_id", F.col("ts_str").cast("timestamp").alias("ts")
        )
        d = src / f"batch{i}"
        df.coalesce(1).write.parquet(str(d))
        for f in d.iterdir():  # the file source orders batches by mtime
            os.utime(f, (now + i * 100, now + i * 100))
    return str(src)


def test_late_rows_dropped_after_watermark(spark, batch_dir, tmp_path):
    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(batch_dir + "/*/")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = "late_test_" + os.path.basename(str(tmp_path)).replace("-", "_")
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")  # append mode only emits FINALIZED windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    rows = {
        r["w"]["start"].hour: r["n"] for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert rows.get(10) == 3, rows  # late 10:05 row NOT counted
    assert dropped == 1  # and the engine reports it as watermark-dropped
