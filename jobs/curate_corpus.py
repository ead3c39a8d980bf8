#!/usr/bin/env python
"""spark-submit entry for the end-to-end curation composition
(nidaba_spark/curate.py): pages → extract → hygiene → dedup → mix →
pack → curated parquet.

Cluster usage mirrors jobs/run_pipeline.py:

    zip -r engine.zip nidaba_spark
    spark-submit --py-files engine.zip jobs/curate_corpus.py \
        --input lake.db.pages --output /curated/run1 \
        --rate en=0.6 --rate de=0.3 --pii-redact \
        --repetition-max-frac 0.18 --decontam-eval /eval/heldout.parquet \
        --near-dup-threshold 0.85

The output is ONE parquet table of packed training examples
(url, n_tokens, tokens_before, pack_id, pack_pos, quality, text) —
the same schema tests/test_curate.py pins.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="nidaba-spark corpus curation")
    ap.add_argument("--input", required=True, help="pages parquet path or catalog table")
    ap.add_argument("--output", required=True, help="curated parquet output path")
    ap.add_argument(
        "--robots", default=None,
        help="parquet path of per-host robots.txt files (columns: host, "
        "robots_txt); disallowed pages drop before parsing",
    )
    ap.add_argument(
        "--robots-agent", default="*",
        help="product token the robots.txt rules are evaluated for",
    )
    ap.add_argument(
        "--wet-out", default=None,
        help="also export the curated corpus as Common-Crawl-shaped WET "
        "segment files to this directory (sources/rawfiles.write_wet; "
        "deterministic bytes, per-record gzip)",
    )
    ap.add_argument(
        "--wet-segments", type=int, default=16,
        help="number of WET segment files (pick total_bytes/1e9 at scale)",
    )
    ap.add_argument(
        "--cdx-out", default=None,
        help="with --wet-out: also build the serveable CDX index over "
        "the written segments (operators/cdx.build_cdx with "
        "warc_file/offset/length carried, sorted parquet) at this path",
    )
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument(
        "--rate", action="append", default=[], metavar="LANG=FRAC",
        help="per-source sampling rate (repeatable); no --rate = keep all",
    )
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--pack-budget", type=int, default=1024)
    ap.add_argument("--nsalt", type=int, default=256)
    ap.add_argument("--npartitions", type=int, default=None)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--pii-redact", action="store_true")
    ap.add_argument("--repetition-max-frac", type=float, default=None)
    ap.add_argument(
        "--gopher-rules", action="store_true",
        help="apply the Gopher A1.1 document-level quality rule set",
    )
    ap.add_argument(
        "--gopher-repetition", action="store_true",
        help="apply the full Gopher A1.2 repetition-removal rule set "
        "(dup line/para fractions, top 2-4-gram and dup 5-10-gram "
        "character mass, all 13 published thresholds)",
    )
    ap.add_argument(
        "--dup-span-max-frac", type=float, default=None,
        help="drop docs whose corpus-wide duplicated n-token-span "
        "fraction (Lee et al. substring signal) exceeds this cut",
    )
    ap.add_argument("--dup-span-n", type=int, default=50)
    ap.add_argument(
        "--dup-span-remove", action="store_true",
        help="REMOVE corpus-duplicated n-token spans and rebuild each "
        "doc from the surviving (normalized) words — Lee et al. "
        "ExactSubstr removal, vs the flag-and-drop --dup-span-max-frac",
    )
    ap.add_argument(
        "--line-dedup", action="store_true",
        help="intra-document exact line dedup (keep first occurrence, "
        "whitespace-only lines survive) — RefinedWeb/MassiveText "
        "repeated-line cleanup, a zero-shuffle projection",
    )
    ap.add_argument(
        "--c4-clean", action="store_true",
        help="C4 page cleaning (Raffel et al. 2020): terminal-punct / "
        ">=5-word / no-javascript line filter + code-brace, lorem-"
        "ipsum, blocklist-word and >=3-sentence page rules",
    )
    ap.add_argument(
        "--dup-span-string-keys", action="store_true",
        help="use the oracle-exact string span keys instead of the "
        "default xxhash64-keyed 10^12-row form",
    )
    ap.add_argument(
        "--decontam-eval", default=None,
        help="parquet path of the held-out eval set (column: text)",
    )
    ap.add_argument(
        "--decontam-bloom-fpp", type=float, default=None,
        help="use the Bloom-filter decontamination scale path at this "
        "false-positive rate (zero train-side shuffles; ~fpp one-sided "
        "over-removal) instead of the exact broadcast join",
    )
    ap.add_argument(
        "--decontam-fuzzy-threshold", type=float, default=None,
        help="use the FUZZY per-eval-sample decontamination rule "
        "(GPT-3/Llama-2 family) instead: drop a doc only when its "
        "shared word-5-grams cover >= this fraction of some single "
        "eval item's grams (takes precedence over --decontam-bloom-fpp)",
    )
    ap.add_argument("--near-dup-threshold", type=float, default=None)
    ap.add_argument(
        "--near-dup-keep", choices=["rep", "best_quality"], default="rep",
        help="duplicate-family survivor policy: 'rep' = min-key member, "
        "'best_quality' = argmax heuristic quality (tiebreak min key)",
    )
    ap.add_argument("--max-docs-per-host", type=int, default=None)
    ap.add_argument("--paragraph-dedup", action="store_true")
    ap.add_argument("--min-model-score", type=float, default=None)
    ap.add_argument(
        "--compression-band", default=None, metavar="LO:HI",
        help="keep only docs whose zlib compression ratio lies in "
        "[LO, HI] (e.g. 0.25:0.9 — cuts repetition below and "
        "gibberish above)",
    )
    ap.add_argument(
        "--canonical-url-dedup", action="store_true",
        help="pre-extraction crawl hygiene: drop robots-noindex pages "
        "and keep one page per declared rel=canonical group",
    )
    ap.add_argument(
        "--lm-ref", default=None, metavar="PATH",
        help="parquet of reference texts for the Stupid-Backoff "
        "bigram-LM quality floor (requires --lm-min-logscore)",
    )
    ap.add_argument("--lm-min-logscore", type=float, default=None)
    ap.add_argument(
        "--host-authority", default=None, metavar="PATH",
        help="parquet of (node|host, rank) — e.g. full_corpus_job's "
        "linkgraph/authority output; drops docs on hosts below "
        "--min-host-authority (absent hosts are kept)",
    )
    ap.add_argument("--min-host-authority", type=float, default=0.0)
    ap.add_argument(
        "--blocked-hosts", default=None,
        help="URL blocklist: comma-separated hosts, or @/path/to/file "
        "with one host per line (canonicalized before matching)",
    )
    ap.add_argument(
        "--blocked-url-pattern", action="append", default=None,
        help="drop urls matching this regex (repeatable; case-folded)",
    )
    ap.add_argument(
        "--max-url-score", type=float, default=None,
        help="drop pages whose soft lexical url_score (operators/"
        "urlqual) reaches this value (RefinedWeb soft URL filtering)",
    )
    ap.add_argument(
        "--recipe", default=None,
        help="published-pipeline preset (c4|gopher|ccnet|refinedweb|"
        "fineweb): applies nidaba_spark.curate.RECIPES[name] for every "
        "option you leave at its default; options you set explicitly "
        "(to a non-default value) win over the preset",
    )
    ap.add_argument(
        "--char-dup-span-remove", action="store_true",
        help="char-level ExactSubstr removal (original bytes kept "
        "outside cut regions); window length via --char-dup-span-L",
    )
    ap.add_argument("--char-dup-span-L", type=int, default=200)
    ap.add_argument(
        "--host-boilerplate-min-pages", type=int, default=None,
        help="remove lines appearing on >= N distinct pages of the "
        "same host (site nav/footer/cookie-banner templates)",
    )
    ap.add_argument(
        "--unicode-nfc", action="store_true",
        help="NFC-normalize extracted text before any hash-keyed stage",
    )
    ap.add_argument(
        "--min-published-date", default=None, metavar="YYYY-MM-DD",
        help="freshness floor: drop pages whose declared publish date "
        "(JSON-LD/OpenGraph/<time>/permalink path) is older; undated "
        "pages pass",
    )
    ap.add_argument(
        "--stitch-pagination", action="store_true",
        help="reassemble rel=next/prev multi-page articles into one "
        "document at the chain head url before any hygiene stage",
    )
    ap.add_argument("--pagination-max-pages", type=int, default=64)
    ap.add_argument(
        "--split", action="append", default=[], metavar="NAME=FRAC",
        help="stratified split assignment, e.g. --split train=0.8 "
        "--split val=0.1 --split test=0.1 (fractions must sum to 1; "
        "adds a 'split' column, does not filter)",
    )
    args = ap.parse_args()
    from nidaba_spark.cliutil import parse_hosts_arg, parse_rates, read_pages

    if args.cdx_out and not args.wet_out:
        # the CDX index is derived FROM the written WET segments; a
        # nested-only branch silently ignored the flag (review r05)
        ap.error("--cdx-out requires --wet-out")
    if (args.lm_ref is None) != (args.lm_min_logscore is None):
        ap.error("--lm-ref and --lm-min-logscore must be given together")
    if args.decontam_bloom_fpp is not None and not args.decontam_eval:
        ap.error("--decontam-bloom-fpp requires --decontam-eval")
    if args.decontam_fuzzy_threshold is not None and not args.decontam_eval:
        ap.error("--decontam-fuzzy-threshold requires --decontam-eval")

    from pyspark.sql import SparkSession

    from nidaba_spark import curate
    from nidaba_spark.session import get_spark, tune_session

    active = SparkSession.getActiveSession()
    spark = tune_session(active) if active else get_spark(app="nidaba-curate", cores=args.cores)

    pages = read_pages(spark, args.input)
    eval_df = spark.read.parquet(args.decontam_eval) if args.decontam_eval else None
    kwargs = dict(
        min_quality=args.min_quality,
        source_rates=parse_rates(args.rate, "--rate"),
        default_rate=args.default_rate,
        pack_budget=args.pack_budget,
        nsalt=args.nsalt,
        npartitions=args.npartitions,
        pii_redact=args.pii_redact,
        repetition_max_frac=args.repetition_max_frac,
        gopher_rules=args.gopher_rules,
        gopher_repetition=args.gopher_repetition,
        dup_span_max_frac=args.dup_span_max_frac,
        dup_span_n=args.dup_span_n,
        dup_span_hash_keys=not args.dup_span_string_keys,
        dup_span_remove=args.dup_span_remove,
        line_dedup=args.line_dedup,
        c4_clean=args.c4_clean,
        decontam_eval=eval_df,
        decontam_bloom_fpp=args.decontam_bloom_fpp,
        decontam_fuzzy_threshold=args.decontam_fuzzy_threshold,
        robots_df=(
            spark.read.parquet(args.robots) if args.robots else None
        ),
        robots_agent=args.robots_agent,
        near_dup_threshold=args.near_dup_threshold,
        near_dup_keep=args.near_dup_keep,
        max_docs_per_host=args.max_docs_per_host,
        paragraph_dedup=args.paragraph_dedup,
        min_model_score=args.min_model_score,
        compression_band=(
            tuple(float(x) for x in args.compression_band.split(":"))
            if args.compression_band
            else None
        ),
        splits=parse_rates(args.split, "--split"),
        canonical_url_dedup=args.canonical_url_dedup,
        lm_ref=(
            spark.read.parquet(args.lm_ref).select("text")
            if args.lm_ref
            else None
        ),
        lm_min_logscore=args.lm_min_logscore,
        host_authority=(
            spark.read.parquet(args.host_authority)
            if args.host_authority
            else None
        ),
        min_host_authority=args.min_host_authority,
        blocked_hosts=parse_hosts_arg(args.blocked_hosts),
        blocked_url_patterns=args.blocked_url_pattern,
        max_url_score=args.max_url_score,
        unicode_nfc=args.unicode_nfc,
        char_dup_span_remove=args.char_dup_span_remove,
        char_dup_span_L=args.char_dup_span_L,
        host_boilerplate_min_pages=args.host_boilerplate_min_pages,
        min_published_date=args.min_published_date,
        stitch_pagination=args.stitch_pagination,
        pagination_max_pages=args.pagination_max_pages,
    )
    if args.recipe:
        import inspect

        if args.recipe not in curate.RECIPES:
            ap.error(
                f"unknown --recipe {args.recipe!r}; "
                f"have {sorted(curate.RECIPES)}"
            )
        sig_defaults = {
            k: p.default
            for k, p in inspect.signature(curate.curate).parameters.items()
        }
        # preset fills every option still at curate()'s own default;
        # anything the user moved off-default stays as given
        for k, v in curate.RECIPES[args.recipe].items():
            if kwargs.get(k) == sig_defaults.get(k):
                kwargs[k] = v
    out = curate.curate(pages, **kwargs)
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    n = written.count()
    npacks = written.select("pack_id").distinct().count()
    print(f"curated {n} documents into {npacks} packs -> {args.output}")
    if args.wet_out:
        from pyspark.sql import functions as F

        from nidaba_spark.sources.rawfiles import write_wet

        # curate() output carries no timestamp; WARC-Date is mandatory,
        # so stamp the epoch (deterministic — never wall-clock)
        wet_src = (
            written
            if "warc_ts" in written.columns
            else written.withColumn(
                "warc_ts", F.to_timestamp(F.lit("1970-01-01 00:00:00"))
            )
        )
        manifest = write_wet(wet_src, args.wet_out, args.wet_segments)
        segs = manifest.count()
        print(f"wrote {segs} WET segments -> {args.wet_out}")
        if args.cdx_out:
            from nidaba_spark.cliutil import export_wet_cdx

            n_caps = export_wet_cdx(spark, args.wet_out, args.cdx_out)
            print(f"wrote CDX index ({n_caps} captures) -> {args.cdx_out}")


if __name__ == "__main__":
    main()
