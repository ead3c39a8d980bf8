"""Streaming session_window (B48) cross-checked against the batch
lag+cumsum sessionization oracle (same 5-min-gap semantics)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_session_window_stream_matches_batch(spark, tmp_path):
    from nidaba_spark.plans.relational import q_sessionize_events
    from nidaba_spark.sources.tables import load
    from nidaba_spark.streaming.events import _as_stream_dir

    sf = "/root/testdata/sf0.001"
    schema = load(spark, sf, "events").schema
    src = _as_stream_dir(os.path.join(sf, "events.parquet"), str(tmp_path))

    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withColumn("ts_tz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_tz", "10 minutes")
        .groupBy(F.session_window("ts_tz", "5 minutes").alias("sw"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    name = "sessions_" + os.path.basename(str(tmp_path)).replace("-", "_")
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_sessions = spark.sql(f"SELECT user_id, n_events FROM {name}").collect()

    batch = q_sessionize_events(spark, sf).collect()

    # same number of sessions per user, same event-count multiset
    def per_user(rows):
        out = {}
        for r in rows:
            out.setdefault(r["user_id"], []).append(r["n_events"])
        return {u: sorted(v) for u, v in out.items()}

    assert per_user(stream_sessions) == per_user(batch)
