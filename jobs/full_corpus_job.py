#!/usr/bin/env python
"""The whole story in ONE spark-submit — the 100 TB dress rehearsal
(VERDICT r04 next #6):

    WARC/WET segments ──(sources/rawfiles, one task per CC-sized
        segment)── pages
      → checkpointed staged extraction (Pipeline.run: resume manifests,
        per-partition lineage, salted-shuffle fused parse)
      → curation from the EXTRACTED stage boundary (curate(
        pre_extracted=...): bloom decontamination, paragraph dedup,
        host cap, model-score floor, weighted mixing, stratified
        splits, sequence packing)
      → serving indexes (BM25 postings + MinHash-LSH + HLL sketches,
        jobs/build_index.py's writers) over the curated table.

    spark-submit --py-files engine.zip jobs/full_corpus_job.py \
        --input /crawl/segments --input-format warc --workdir /runs/r1

Per-phase wall-clock, row counts, lineage-row counts and cumulative /
peak shuffle bytes (from the AppStatusStore) are written to
``<workdir>/rehearsal_metrics.json`` and printed, so a run leaves a
machine-readable record of where the bytes went. On the 10^12-row
deployment each phase boundary is an Iceberg snapshot instead of a
local parquet dir; the operators and their composition are identical.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _shuffle_totals(spark) -> dict:
    """Cumulative shuffle bytes + per-stage peak from the status store
    (py4j: scala default args are materialized via stageList$default$N)."""
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = spark.sparkContext._jvm.java.util.ArrayList()
    defaults = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    stages = store.stageList(empty, *defaults)
    writes = [stages.apply(i).shuffleWriteBytes() for i in range(stages.size())]
    return {
        "shuffle_write_bytes": int(sum(writes)),
        "peak_stage_shuffle_write_bytes": int(max(writes, default=0)),
        "stages": stages.size(),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description="WARC -> extract -> curate -> index")
    ap.add_argument("--input", required=True, help="WARC dir / pages parquet")
    ap.add_argument("--input-format", default="warc", choices=["warc", "parquet"])
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--run-id", default="full0")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--npartitions", type=int, default=None)
    ap.add_argument("--pack-budget", type=int, default=1024)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--min-model-score", type=float, default=0.5)
    ap.add_argument("--max-docs-per-host", type=int, default=None)
    ap.add_argument("--gopher-rules", action="store_true")
    ap.add_argument("--c4-clean", action="store_true")
    ap.add_argument(
        "--blocked-hosts", default=None,
        help="comma-separated hosts or @file, dropped before curation",
    )
    ap.add_argument("--decontam-bloom-fpp", type=float, default=1e-9)
    ap.add_argument(
        "--eval-residue", type=int, default=997,
        help="synthesize the held-out eval set as urls with "
        "xxhash64(url) %% RESIDUE == 0 (deterministic, no external data)",
    )
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument(
        "--robots", default=None,
        help="parquet of per-host robots.txt (host, robots_txt); "
        "disallowed pages drop before any hygiene stage",
    )
    ap.add_argument("--robots-agent", default="*")
    ap.add_argument(
        "--wet-out", default=None,
        help="also export the curated corpus as CC-shaped WET segments",
    )
    ap.add_argument("--wet-segments", type=int, default=64)
    ap.add_argument(
        "--wat-out", default=None,
        help="also export per-page WAT metadata segments (head meta + "
        "resolved outlinks/anchors as JSON envelopes) from the RAW "
        "crawl pages — the link-graph-shaped artifact, no page bytes",
    )
    ap.add_argument("--wat-segments", type=int, default=64)
    ap.add_argument(
        "--images-out", default=None,
        help="also export multimodal image-text pair candidates "
        "(resolved <img> src + alt/title captions) from the pages "
        "that SURVIVED curation — the fetch-stage work list",
    )
    args = ap.parse_args()
    from nidaba_spark.cliutil import parse_hosts_arg

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from nidaba_spark import curate as curate_mod
    from nidaba_spark.operators.dedup import minhash_index
    from nidaba_spark.operators.search import append_postings
    from nidaba_spark.operators.sketches import token_hll_sketches
    from nidaba_spark.pipeline import Pipeline
    from nidaba_spark.session import get_spark, tune_session

    active = SparkSession.getActiveSession()
    spark = tune_session(active) if active else get_spark(
        app="nidaba-full-corpus", cores=args.cores
    )

    metrics: dict = {"run_id": args.run_id, "phases": {}}
    t_job = time.perf_counter()

    def phase(name):
        class _P:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                if not exc[0]:
                    metrics["phases"][name] = {
                        "wall_sec": round(time.perf_counter() - self.t0, 2),
                        **_shuffle_totals(spark),
                    }

        return _P()

    # ---- phase 1: ingest + checkpointed extraction (lineage, resume)
    with phase("extract"):
        if args.input_format == "warc":
            from nidaba_spark.sources.rawfiles import read_warc_pages

            pages = read_warc_pages(spark, args.input)
        else:
            pages = spark.read.parquet(args.input)
        pipe = Pipeline(
            spark, os.path.join(args.workdir, "pipeline"),
            run_id=args.run_id, npartitions=args.npartitions,
        )
        extracted = pipe.run(pages)
        metrics["extracted_rows"] = extracted.count()

    # ---- phase 2: curation from the extracted stage boundary
    with phase("curate"):
        eval_df = extracted.filter(
            F.pmod(F.xxhash64("url"), F.lit(args.eval_residue)) == 0
        ).select("text")
        curated = curate_mod.curate(
            None,
            min_quality=args.min_quality,
            source_rates={"und": 0.95, "en": 0.95},
            default_rate=1.0,
            pack_budget=args.pack_budget,
            npartitions=args.npartitions,
            decontam_eval=eval_df,
            decontam_bloom_fpp=args.decontam_bloom_fpp,
            max_docs_per_host=args.max_docs_per_host,
            gopher_rules=args.gopher_rules,
            c4_clean=args.c4_clean,
            blocked_hosts=parse_hosts_arg(args.blocked_hosts),
            paragraph_dedup=True,
            min_model_score=args.min_model_score,
            splits={"train": 0.98, "val": 0.01, "test": 0.01},
            pre_extracted=extracted,
            robots_df=(
                spark.read.parquet(args.robots) if args.robots else None
            ),
            robots_agent=args.robots_agent,
        )
        curated_path = os.path.join(args.workdir, "curated")
        curated.write.mode("overwrite").parquet(curated_path)
        curated = spark.read.parquet(curated_path)
        metrics["curated_rows"] = curated.count()
        metrics["curated_packs"] = curated.select("pack_id").distinct().count()

    # ---- phase 3: crawl link graph + domain authority (r05): one
    # codegen scan of the raw pages (never the curated text), host-pair
    # counts map-side-combined, PageRank over the aggregated host
    # graph — the authority signal future curation runs can join as a
    # quality prior.
    with phase("linkgraph"):
        from nidaba_spark.operators.graphrank import pagerank
        from nidaba_spark.operators.links import host_edges, page_links

        lg = os.path.join(args.workdir, "indexes", "linkgraph")
        edges = host_edges(page_links(pages))
        edges.write.mode("overwrite").parquet(os.path.join(lg, "edges"))
        edges = spark.read.parquet(os.path.join(lg, "edges"))
        metrics["host_edges"] = edges.count()
        if metrics["host_edges"]:
            pagerank(
                edges, iters=10,
                src="src_host", dst="dst_host", weight="n_links",
            ).write.mode("overwrite").parquet(os.path.join(lg, "authority"))

    # ---- phase 4: serving indexes over the curated table
    with phase("index"):
        idx = os.path.join(args.workdir, "indexes")
        append_postings(
            curated, os.path.join(idx, "bm25"), 0,
            buckets=args.buckets, id_col="url",
        )
        minhash_index(curated, id_col="url").write.mode("overwrite").parquet(
            os.path.join(idx, "lsh", "batch=0")
        )
        token_hll_sketches(
            curated.withColumn("lang", F.lit("all"))
        ).write.mode("overwrite").parquet(os.path.join(idx, "hll", "batch=0"))

    # ---- phase 5 (optional): WET egress — the curated corpus back out
    # as CC-shaped conversion-record segments any WET consumer (or this
    # repo's own reader) ingests; deterministic bytes, sha256 manifest.
    if args.wet_out:
        with phase("wet_export"):
            from nidaba_spark.sources.rawfiles import write_wet

            # real capture timestamps, not a synthetic epoch: the
            # curated table doesn't carry warc_ts, so join it back
            # from the raw pages (max per url = the capture the
            # recrawl-dedup kept). This is ALSO what makes the
            # WET↔WAT record cross-reference real — WARC-Refers-To
            # derives from (url, ts), so both writers must see the
            # same timestamp for the same capture (review r05).
            caps = pages.groupBy("url").agg(F.max("warc_ts").alias("warc_ts"))
            wet_src = curated.join(caps, "url", "left").withColumn(
                "warc_ts",
                F.coalesce(
                    "warc_ts", F.to_timestamp(F.lit("1970-01-01 00:00:00"))
                ),
            )
            manifest = write_wet(wet_src, args.wet_out, args.wet_segments)
            agg = manifest.agg(
                F.count(F.lit(1)), F.sum("n_records"), F.sum("n_bytes")
            ).collect()[0]
            metrics["wet_segments"] = agg[0]
            metrics["wet_records"] = agg[1]
            metrics["wet_bytes"] = agg[2]

        # the archive's lookup artifact rides with its segments: a
        # serveable CDX (surt-sorted, carrying each record's gzip
        # member range for fetch_capture point reads)
        with phase("cdx_index"):
            from nidaba_spark.cliutil import export_wet_cdx

            cdx_path = os.path.join(args.workdir, "indexes", "cdx")
            metrics["cdx_captures"] = export_wet_cdx(
                spark, args.wet_out, cdx_path
            )

    # ---- phase 6 (optional): WAT egress — head metadata + resolved
    # outlinks per RAW page as JSON metadata records (the crawl-graph
    # artifact: consumers get the link structure without page bytes).
    # Independent of --wet-out; shares write_wet's shard permutation so
    # wat-N pairs with wet-N when both are exported.
    if args.wat_out:
        with phase("wat_export"):
            from nidaba_spark.sources.rawfiles import write_wat

            manifest = write_wat(pages, args.wat_out, args.wat_segments)
            agg = manifest.agg(
                F.count(F.lit(1)), F.sum("n_records"), F.sum("n_bytes")
            ).collect()[0]
            metrics["wat_segments"] = agg[0]
            metrics["wat_records"] = agg[1]
            metrics["wat_bytes"] = agg[2]

    # ---- phase 7 (optional): multimodal candidates — image-text
    # pairs (structured.image_text_pairs) from the RAW html of pages
    # that SURVIVED curation: the page already passed every quality /
    # dedup / decontamination judgment, so its images inherit that
    # judgment, and the output is exactly the fetch stage's work list
    # (img_url to GET, caption to pair). The pair scan is one codegen
    # pass over (url, html); the semi-join keys on url with the slim
    # curated side broadcast by AQE at rehearsal scale.
    if args.images_out:
        with phase("images_export"):
            from nidaba_spark.operators.structured import image_text_pairs

            pairs = image_text_pairs(pages).join(
                curated.select("url"), "url", "left_semi"
            )
            pairs.write.mode("overwrite").parquet(args.images_out)
            metrics["image_pairs"] = spark.read.parquet(args.images_out).count()

    metrics["lineage_rows"] = pipe.lineage().count()
    metrics["total_wall_sec"] = round(time.perf_counter() - t_job, 2)
    with open(os.path.join(args.workdir, "rehearsal_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
