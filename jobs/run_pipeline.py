#!/usr/bin/env python
"""spark-submit entry point (north_rule: "run via spark-submit
--py-files on a multi-executor cluster").

Cluster usage:

    zip -r engine.zip nidaba_spark
    spark-submit --py-files engine.zip \
        --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:1.5.0 \
        --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
        --conf spark.sql.catalog.lake.type=hadoop \
        --conf spark.sql.catalog.lake.warehouse=s3://bucket/warehouse \
        jobs/run_pipeline.py --input lake.db.pages --output /runs --run-id r1

Local (sandbox) usage reads/writes parquet paths. Resume: re-running
with the same --run-id and --resume skips completed stages (manifests
under the run dir); --invalidate-from forces recomputation of a tail.

Analog of nidaba's CLI batch entry (reference: nidaba/cli.py `batch`
command assembling Batch.add_document/add_task/run — SURVEY.md §3.1 E1).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="nidaba-spark extraction pipeline")
    ap.add_argument("--input", required=True, help="pages parquet path or catalog table")
    ap.add_argument("--output", required=True, help="run directory (checkpoints + lineage)")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--nsalt", type=int, default=256)
    ap.add_argument("--npartitions", type=int, default=None)
    ap.add_argument("--resume", action="store_true", default=True)
    ap.add_argument("--no-resume", dest="resume", action="store_false")
    ap.add_argument("--invalidate-from", default=None, choices=[None, "decode", "segment", "classify", "merge"])
    ap.add_argument("--cores", type=int, default=None, help="local[] cores; ignored under spark-submit with a master")
    ap.add_argument(
        "--stream",
        action="store_true",
        help="run as a Structured Streaming job over --input as a drop "
        "folder: availableNow catch-up, exactly-once parquet sink, "
        "resumable from the engine checkpoint under --output",
    )
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument(
        "--markdown-out",
        default=None,
        help="also write structure-preserving Markdown documents to "
        "this path — rendered from the completed segment checkpoint "
        "(a pure-Column pass; the parse is never repeated)",
    )
    ap.add_argument(
        "--input-format",
        default="parquet",
        choices=["parquet", "warc"],
        help="batch input: 'parquet' (pages table/path) or 'warc' "
        "(directory of WARC/WET segments, ISO 28500 multi-record "
        "framing incl. Common Crawl gzip — sources/rawfiles.py)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from nidaba_spark.pipeline import Pipeline
    from nidaba_spark.session import get_spark, tune_session

    active = SparkSession.getActiveSession()
    spark = tune_session(active) if active else get_spark(app="nidaba-pipeline", cores=args.cores)

    if args.stream:
        if args.markdown_out:
            # the streaming branch returns below and would silently
            # ignore the requested markdown dataset
            ap.error("--markdown-out is not supported with --stream")
        from nidaba_spark.streaming import extract as sx

        out = os.path.join(args.output, "stream_extracted")
        sx.extract_pages_stream(
            spark,
            args.input,
            out,
            os.path.join(args.output, "stream_ckpt"),
            nsalt=args.nsalt,
            npartitions=args.npartitions,
            max_files_per_trigger=args.max_files_per_trigger,
            lineage_dir=os.path.join(args.output, "_lineage"),
            run_id=args.run_id,
        )
        n = sx.read_extracted(spark, out).count()
        print(f"stream-extracted table now holds {n} documents -> {out}")
        return

    if args.input_format == "warc":
        from nidaba_spark.sources.rawfiles import read_warc_pages

        pages = read_warc_pages(spark, args.input)
    else:
        from nidaba_spark.cliutil import read_pages

        pages = read_pages(spark, args.input)
    p = Pipeline(spark, args.output, run_id=args.run_id, nsalt=args.nsalt, npartitions=args.npartitions)
    if args.invalidate_from:
        p.invalidate_from(args.invalidate_from)
    ext = p.run(pages, resume=args.resume)
    n = ext.count()
    print(f"extracted {n} documents -> {p._stage_path('merge')}")
    if args.markdown_out:
        p.markdown().write.mode("overwrite").parquet(args.markdown_out)
        print(f"markdown documents -> {args.markdown_out}")
    lin = p.lineage().groupBy("stage").count().collect()
    print("lineage rows per stage:", {r["stage"]: r["count"] for r in lin})


if __name__ == "__main__":
    main()
