"""Streaming tagger pass: stream ≡ batch signals, exactly-once across
drops, resume replays nothing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from nidaba_spark.annotate import annotate
from nidaba_spark.streaming.annotate import annotate_docs_stream, read_signals

SCHEMA = "doc_id LONG, text STRING"


def _docs(spark, ids):
    rows = [
        (i, f"Document {i} has several plain words here to score properly.")
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch_and_resumes(spark, tmp_path):
    src = str(tmp_path / "drops")
    out = str(tmp_path / "signals")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = spark.createDataFrame([], SCHEMA).schema

    # drop 1
    _docs(spark, range(0, 5)).write.mode("append").parquet(src)
    annotate_docs_stream(spark, src, out, ckpt, schema)
    got1 = read_signals(spark, out)
    assert got1.count() == 5

    # drop 2 lands; resuming with the same checkpoint processes ONLY it
    _docs(spark, range(5, 8)).write.mode("append").parquet(src)
    annotate_docs_stream(spark, src, out, ckpt, schema)
    got2 = read_signals(spark, out)
    assert got2.count() == 8  # no dupes, no gaps

    # byte-parity with the one-shot batch pass over the same files
    batch = annotate(spark.read.parquet(src))
    assert _canon(got2.select(*batch.columns)) == _canon(batch)

    # idempotent re-run with nothing new: replays nothing
    annotate_docs_stream(spark, src, out, ckpt, schema)
    assert read_signals(spark, out).count() == 8


def test_stream_cli(spark, tmp_path, monkeypatch):
    import runpy
    import sys as _sys

    src = str(tmp_path / "in")
    out = str(tmp_path / "sig")
    _docs(spark, range(4)).write.parquet(src)
    monkeypatch.setattr(
        _sys, "argv",
        ["annotate_corpus.py", "--input", src, "--output", out, "--stream"],
    )
    runpy.run_path("jobs/annotate_corpus.py", run_name="__main__")
    assert spark.read.parquet(out).count() == 4
