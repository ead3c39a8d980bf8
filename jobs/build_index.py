"""Build the serving indexes for a (curated) corpus in one job:

    spark-submit jobs/build_index.py \
        --input /curated/docs --output /indexes --batch-id 3

Writes, under --output:
  bm25/       — term-hash-bucketed postings + doclen + mergeable stats
                (operators/search.py; queries prune to their terms'
                buckets; batch-appendable)
  lsh/batch=N — MinHash-LSH index rows (operators/dedup.minhash_index;
                exactly associative, so future crawl batches dedup
                against the union without rescanning this one)
  hll/batch=N — per-lang HLL sketch rows + token counts
                (operators/sketches.py; union-aggregatable forever)
  ivfpq/      — with --vectors: the persisted IVF-PQ ANN index
                (operators/pq.build_ivfpq_index; coded table
                PARTITIONED BY cell so queries read only their
                probed cells, + KB-scale model tables)

Re-running with the same --batch-id overwrites exactly that batch's
subdirectories — idempotent replay, the same convergence contract as
streaming/dedup.py and append_postings.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="build corpus serving indexes")
    ap.add_argument("--input", help="docs parquet (id, text[, lang])")
    ap.add_argument("--output", required=True)
    ap.add_argument("--batch-id", type=int, default=0)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument(
        "--vectors", default=None, metavar="PATH",
        help="embeddings parquet (vec_id, embedding) — also build the "
        "cell-partitioned IVF-PQ ANN index under <output>/ivfpq",
    )
    ap.add_argument("--nlist", type=int, default=16)
    ap.add_argument("--pq-m", type=int, default=8)
    ap.add_argument("--pq-ksub", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument(
        "--compact",
        action="store_true",
        help="merge the BM25 index's accumulated batch=N subdirectories "
        "into one (small-files repair; scores are byte-identical). "
        "Runs after the append when --input is given, or standalone "
        "on an existing index without it.",
    )
    args = ap.parse_args()
    if not args.input and not args.compact and not args.vectors:
        ap.error("--input is required unless --compact or --vectors")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from nidaba_spark.operators.dedup import minhash_index
    from nidaba_spark.operators.search import append_postings, compact_postings
    from nidaba_spark.operators.sketches import token_hll_sketches
    from nidaba_spark.session import get_spark, tune_session

    active = SparkSession.getActiveSession()
    spark = tune_session(active) if active else get_spark(
        app="nidaba-index", cores=args.cores
    )
    if args.input:
        docs = spark.read.parquet(args.input)

        append_postings(
            docs, os.path.join(args.output, "bm25"), args.batch_id,
            buckets=args.buckets, text_col=args.text_col, id_col=args.id_col,
        )
        minhash_index(docs, text_col=args.text_col, id_col=args.id_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(args.output, "lsh", f"batch={args.batch_id}"))
        hll_src = docs if "lang" in docs.columns else docs.withColumn("lang", F.lit("all"))
        token_hll_sketches(hll_src, text_col=args.text_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(args.output, "hll", f"batch={args.batch_id}"))

        n = docs.count()
        print(f"indexed {n} docs (batch {args.batch_id}) -> {args.output}")
    if args.vectors:
        from nidaba_spark.operators.pq import append_ivfpq, build_ivfpq_index

        vecs = spark.read.parquet(args.vectors)
        vpath = os.path.join(args.output, "ivfpq")
        if args.batch_id > 0:
            # incremental: encode this batch with the PERSISTED model
            # into its own coded/batch=N subdirectory (no retraining)
            append_ivfpq(vecs, vpath, batch_id=args.batch_id, dim=args.dim)
            print(
                f"appended ivfpq batch {args.batch_id} -> {vpath}"
            )
        else:
            build_ivfpq_index(
                vecs, vpath,
                nlist=args.nlist, m=args.pq_m, ksub=args.pq_ksub, dim=args.dim,
            )
            print(f"built ivfpq index (nlist={args.nlist}) -> {vpath}")
    if args.compact:
        info = compact_postings(spark, os.path.join(args.output, "bm25"))
        print(
            f"compacted bm25 index: {info['batches_before']} batches -> 1, "
            f"{info['postings_files_before']} -> {info['postings_files_after']} "
            "postings files"
        )
        # probe through the Hadoop FS layer, not os.path — --output may
        # be an hdfs:// / s3a:// URI where a driver-local isdir is
        # always False and would silently skip the coded compaction
        vpath = os.path.join(args.output, "ivfpq", "coded")
        jpath = spark.sparkContext._jvm.org.apache.hadoop.fs.Path(vpath)
        vfs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if vfs.exists(jpath):
            from nidaba_spark.operators.pq import compact_coded

            vinfo = compact_coded(spark, os.path.join(args.output, "ivfpq"))
            print(
                f"compacted ivfpq coded table: {vinfo['batches_before']} "
                f"batches -> 1, {vinfo['coded_files_before']} -> "
                f"{vinfo['coded_files_after']} files"
            )


if __name__ == "__main__":
    main()
