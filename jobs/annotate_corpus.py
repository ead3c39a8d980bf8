"""spark-submit entry: corpus → one-scan per-document signal table.

The Dolma-style tagger pass (nidaba_spark/annotate.py): every
scan-level quality signal — heuristic quality, token counts,
fingerprint, PII counts, Unicode scripts, Gopher A1.1 measures, C4
page stats, each family's keep flag — computed in a SINGLE pass over
the text and persisted keyed by document. Downstream recipes filter
the signal table (tiny) instead of re-reading the 100 TB text column;
threshold changes cost a signal-table scan, not a corpus scan.

Input: either an extracted/curated docs parquet (has a text column and
an id column — defaults doc_id/text, override with --id-col/--text-col
e.g. url), or raw pages via --extract (runs pipeline.extract first).

    spark-submit --py-files nidaba_spark.zip jobs/annotate_corpus.py \
        --input out/extracted --output out/signals --id-col url
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="nidaba-spark corpus tagger pass")
    ap.add_argument("--input", required=True, help="docs/pages parquet path")
    ap.add_argument("--output", required=True, help="signal-table parquet path")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument(
        "--extract", action="store_true",
        help="input is raw pages: run the fused extraction first "
        "(signals then key by url)",
    )
    ap.add_argument(
        "--stream", action="store_true",
        help="watch --input as a drop folder (Structured Streaming, "
        "availableNow drain): each new parquet file's signals append "
        "exactly once; resume via --checkpoint",
    )
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint dir for --stream (default: "
                    "<output>_ckpt)")
    ap.add_argument(
        "--schema", default=None,
        help="input schema as DDL ('doc_id LONG, text STRING') — lets "
        "--stream start watching an EMPTY drop folder; otherwise the "
        "schema is inferred from the files already present",
    )
    ap.add_argument("--gopher-min-words", type=int, default=50)
    ap.add_argument("--gopher-max-words", type=int, default=100_000)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from nidaba_spark.annotate import annotate
    from nidaba_spark.session import get_spark, tune_session

    active = SparkSession.getActiveSession()
    spark = (
        tune_session(active)
        if active
        else get_spark(app="nidaba-annotate", cores=args.cores)
    )
    id_col, text_col = args.id_col, args.text_col
    if args.stream:
        # NO eager batch read first: a watcher started on an empty
        # drop folder must wait for drops, not crash on schema
        # inference (review r05)
        if args.extract:
            ap.error("--stream annotates extracted docs; run the "
                     "extraction stream first (jobs/run_pipeline.py "
                     "--stream), then point --input at its output")
        from pyspark.sql.types import StructType

        from nidaba_spark.streaming.annotate import annotate_docs_stream

        if args.schema:
            schema = StructType.fromDDL(args.schema)
        else:
            try:
                schema = spark.read.parquet(args.input).schema
            except Exception:
                ap.error(
                    f"no readable parquet in {args.input} yet — pass "
                    "--schema 'doc_id LONG, text STRING' to start the "
                    "watcher before the first drop"
                )
        annotate_docs_stream(
            spark, args.input, args.output,
            args.checkpoint or args.output + "_ckpt",
            schema, text_col=text_col, id_col=id_col,
            gopher_min_words=args.gopher_min_words,
            gopher_max_words=args.gopher_max_words,
        )
        # empty-safe report: a drain that committed ZERO batches (the
        # advertised start-the-watcher-before-the-first-drop flow)
        # never creates the sink dir; a bare read would crash the job
        # after a successful no-op drain (review r05)
        sc = spark.sparkContext
        jpath = sc._jvm.org.apache.hadoop.fs.Path(args.output)
        fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
        n = spark.read.parquet(args.output).count() if fs.exists(jpath) else 0
        print(f"stream drained; signal table now {n} rows -> {args.output}")
        return
    docs = spark.read.parquet(args.input)
    if args.extract:
        from nidaba_spark import pipeline

        docs = pipeline.extract(docs)
        id_col, text_col = "url", "text"
    out = annotate(
        docs,
        text_col=text_col,
        id_col=id_col,
        gopher_min_words=args.gopher_min_words,
        gopher_max_words=args.gopher_max_words,
    )
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    n = written.count()
    kept = written.filter("c4_keep AND gopher_keep").count()
    print(
        f"annotated {n} documents ({len(written.columns)} signals) -> "
        f"{args.output}; c4&gopher keep: {kept}"
    )


if __name__ == "__main__":
    main()
