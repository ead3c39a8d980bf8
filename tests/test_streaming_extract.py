"""Streaming extraction (streaming/extract.py): the fused pipeline as
a Structured Streaming job, pinned to the batch path.

  * drop 1: stream over the first half of the smoke corpus must be
    byte-identical (url, text, spans) to the batch extract of the
    same rows.
  * drop 2 + SAME checkpoint: only the new files are processed —
    no dupes, no gaps; the maintained table now equals the batch
    extract of the union. This is the resume-from-checkpoint
    guarantee the north rule asks for, exercised end-to-end.
  * lineage: micro-batch rows land in the shared _lineage schema.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from nidaba_spark import corpus, pipeline, schemas
from nidaba_spark.streaming import extract as sx

N = 240  # covers every variant class boundary under mod-101 hits


def _write_drop(rows: list[dict], path: str) -> None:
    schema = pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(
            [
                {k: r[k] for k in ("url", "warc_ts", "html", "text", "lang")}
                for r in rows
            ],
            schema=schema,
        ),
        path,
    )


def _snapshot(df) -> dict:
    rows = df.select("url", "text", F.to_json("spans").alias("sp")).collect()
    assert len({r["url"] for r in rows}) == len(rows), "duplicate urls in sink"
    return {r["url"]: (r["text"], r["sp"]) for r in rows}


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream_extract")
    src = base / "drops"
    src.mkdir()
    return {
        "src": str(src),
        "out": str(base / "out"),
        "ckpt": str(base / "ckpt"),
        "lineage": str(base / "lineage"),
    }


def test_stream_matches_batch_and_resumes(spark, dirs):
    rows = corpus.generate_rows(N)
    half = N // 2

    # ---- drop 1
    _write_drop(rows[:half], os.path.join(dirs["src"], "drop1.parquet"))
    sx.extract_pages_stream(
        spark,
        dirs["src"],
        dirs["out"],
        dirs["ckpt"],
        npartitions=8,
        lineage_dir=dirs["lineage"],
        run_id="t-stream",
    )
    got1 = _snapshot(sx.read_extracted(spark, dirs["out"]))
    pages1 = spark.createDataFrame(
        pd.DataFrame(rows[:half]), schema=schemas.PAGES
    )
    want1 = _snapshot(pipeline.extract(pages1, npartitions=8, mode="fused_inline"))
    assert got1 == want1

    # ---- drop 2 against the SAME checkpoint: only new files processed
    _write_drop(rows[half:], os.path.join(dirs["src"], "drop2.parquet"))
    sx.extract_pages_stream(
        spark,
        dirs["src"],
        dirs["out"],
        dirs["ckpt"],
        npartitions=8,
        lineage_dir=dirs["lineage"],
        run_id="t-stream",
    )
    got_all = _snapshot(sx.read_extracted(spark, dirs["out"]))
    pages_all = spark.createDataFrame(pd.DataFrame(rows), schema=schemas.PAGES)
    want_all = _snapshot(pipeline.extract(pages_all, npartitions=8, mode="fused_inline"))
    assert got_all == want_all  # no dupes (snapshot asserts), no gaps

    # ---- lineage rows in the shared schema
    lin = spark.read.schema(schemas.LINEAGE).parquet(dirs["lineage"])
    stages = {r["stage"] for r in lin.select("stage").distinct().collect()}
    assert stages == {"stream_extract"}
    assert lin.filter(F.col("input_rows") > 0).count() >= 2  # one per drop


def test_pruned_mode_stream_matches_batch_and_resumes(spark, tmp_path):
    """mode='pruned' (VERDICT r04 next #9): the two-phase text-pruned
    batch plan per micro-batch via foreachBatch, exactly-once through
    batch_id-keyed partition overwrites — same stream ≡ batch byte
    contract and checkpoint-resume guarantee as the inline sink."""
    rows = corpus.generate_rows(N)
    half = N // 2
    src = tmp_path / "drops"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    lineage = str(tmp_path / "lineage")

    _write_drop(rows[:half], os.path.join(str(src), "drop1.parquet"))
    sx.extract_pages_stream(
        spark, str(src), out, ckpt, npartitions=8,
        lineage_dir=lineage, run_id="t-pruned", mode="pruned",
    )
    got1 = _snapshot(sx.read_extracted(spark, out))
    pages1 = spark.createDataFrame(pd.DataFrame(rows[:half]), schema=schemas.PAGES)
    want1 = _snapshot(pipeline.extract(pages1, npartitions=8, mode="fused"))
    assert got1 == want1

    _write_drop(rows[half:], os.path.join(str(src), "drop2.parquet"))
    sx.extract_pages_stream(
        spark, str(src), out, ckpt, npartitions=8,
        lineage_dir=lineage, run_id="t-pruned", mode="pruned",
    )
    got_all = _snapshot(sx.read_extracted(spark, out))
    pages_all = spark.createDataFrame(pd.DataFrame(rows), schema=schemas.PAGES)
    want_all = _snapshot(pipeline.extract(pages_all, npartitions=8, mode="fused"))
    assert got_all == want_all  # no dupes (snapshot asserts), no gaps
    lin = spark.read.schema(schemas.LINEAGE).parquet(lineage)
    assert lin.filter(F.col("stage") == "stream_extract").count() >= 2
