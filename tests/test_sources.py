"""Raw binaryFile ingest (B3) + foreachBatch upsert sink (B50)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nidaba_spark import corpus, oracle, pipeline
from nidaba_spark.sources.rawfiles import read_raw_pages


def test_binaryfile_ingest_through_pipeline(spark, tmp_path):
    raw_dir = tmp_path / "drop"
    raw_dir.mkdir()
    rows = [corpus.make_row(k) for k in range(40)]
    for i, r in enumerate(rows):
        with open(raw_dir / f"page{i}.html", "wb") as f:
            f.write(r["html"] or b"")
    pages = read_raw_pages(spark, str(raw_dir))
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    got = {
        os.path.basename(r["url"]): r["text"]
        for r in pipeline.extract(pages).collect()
    }
    # the binaryFile source skips zero-byte files (k=4 is the 'zero'
    # corpus variant) — acceptable: an empty drop carries no content
    n_nonempty = sum(1 for r in rows if r["html"])
    assert len(got) == n_nonempty == 39
    for i, r in enumerate(rows):
        if not r["html"]:
            continue
        # crawler text column is null for raw drops -> no fallback text
        exp, _ = oracle.extract(r["html"], None)
        assert got[f"page{i}.html"] == exp, i


def test_foreach_batch_upsert(spark, tmp_path):
    from nidaba_spark.sources.tables import load
    from nidaba_spark.streaming.events import foreach_batch_upsert

    sf = "/root/testdata/sf0.001"
    schema = load(spark, sf, "events").schema
    target = foreach_batch_upsert(
        spark, os.path.join(sf, "events.parquet"), schema, str(tmp_path)
    )
    out = spark.read.schema(schema).parquet(target)
    src = load(spark, sf, "events")
    assert out.count() == src.count()  # all unique ids, none lost
    assert out.select(F.countDistinct("event_id")).collect()[0][0] == src.count()
    # idempotent: re-running the catch-up must not duplicate anything
    target2 = foreach_batch_upsert(
        spark, os.path.join(sf, "events.parquet"), schema, str(tmp_path) + "_2"
    )
    assert spark.read.schema(schema).parquet(target2).count() == src.count()


def test_stream_lineage_rows(spark, tmp_path):
    """VERDICT r03 next #8: stream ingest writes per-micro-batch
    lineage rows through the same _lineage schema the batch Pipeline
    uses, so one lineage() read covers batch stages and stream
    batches."""
    from nidaba_spark import schemas
    from nidaba_spark.sources.tables import load
    from nidaba_spark.streaming.events import (
        foreach_batch_upsert,
        ingest_events_stream,
    )

    sf = "/root/testdata/sf0.001"
    schema = load(spark, sf, "events").schema
    lineage_dir = str(tmp_path / "_lineage")
    ingest_events_stream(
        spark,
        os.path.join(sf, "events.parquet"),
        schema,
        str(tmp_path / "ing"),
        lineage_dir=lineage_dir,
        run_id="run_s",
    )
    foreach_batch_upsert(
        spark,
        os.path.join(sf, "events.parquet"),
        schema,
        str(tmp_path / "fb"),
        lineage_dir=lineage_dir,
        run_id="run_s",
    )
    lin = spark.read.schema(schemas.LINEAGE).parquet(lineage_dir)
    by_stage: dict[str, list] = {}
    for r in lin.collect():
        by_stage.setdefault(r["stage"], []).append(r)
    n_events = load(spark, sf, "events").count()
    assert {"stream_ingest", "stream_upsert"} <= set(by_stage)
    for stage in ("stream_ingest", "stream_upsert"):
        rows = by_stage[stage]
        # one row per micro-batch (availableNow may log a trailing
        # zero-row finalization batch — real engine activity, kept)
        assert all(r["run_id"] == "run_s" and r["status"] == "ok" for r in rows)
        assert sum(r["input_rows"] for r in rows) == n_events
        assert all(r["finished"] >= r["started"] for r in rows)
        assert len({r["partition_id"] for r in rows}) == len(rows)  # batch ids unique
