#!/usr/bin/env python
"""Materialize the deterministic bench corpus as Common-Crawl-style
WARC segments (member-gzip response records, one .warc.gz per task) —
the input fixture for the full-pipeline dress rehearsal
(jobs/full_corpus_job.py). No external data: pages come from
nidaba_spark.benchcorpus (seed=42).

    python scripts/make_warc_corpus.py --rows 1000000 \
        --out /tmp/warc_1m --segments 64

Only `response` records are written (html payloads); the parquet
corpus's crawler-text column has no per-page home in response-only
WARC — in production that text arrives as separate WET `conversion`
records. Fallback-needy docs therefore extract empty from this
fixture and drop at curation's text!='' filter, which is the honest
WARC-only behavior.
"""

from __future__ import annotations

import argparse
import gzip
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--segments", type=int, default=64)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from nidaba_spark import benchcorpus
    from nidaba_spark.session import get_spark

    spark = get_spark(app="make-warc", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    pages = benchcorpus.load_pages(
        spark, args.rows, os.path.join(REPO, ".cache")
    ).select("url", "warc_ts", "html")
    os.makedirs(args.out, exist_ok=True)
    out_dir = args.out

    def write_segment(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"seg-{pid:05d}.warc.gz")
        n = 0
        with open(path, "wb") as f:
            for pdf in batches:
                for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                    body = bytes(html) if html is not None else b""
                    payload = (
                        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
                    )
                    date = (
                        ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                        if ts is not None
                        else "2026-01-01T00:00:00Z"
                    )
                    rec = (
                        f"WARC/1.0\r\nWARC-Type: response\r\n"
                        f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n"
                        f"Content-Length: {len(payload)}\r\n\r\n"
                    ).encode() + payload + b"\r\n\r\n"
                    f.write(gzip.compress(rec, compresslevel=1))
                    n += 1
        yield pd.DataFrame({"path": [path], "records": [n]})

    stats = (
        pages.repartition(args.segments)
        .mapInPandas(write_segment, "path string, records long")
        .collect()
    )
    total = sum(r["records"] for r in stats)
    size = sum(os.path.getsize(r["path"]) for r in stats)
    print(f"wrote {len(stats)} segments, {total} records, {size/1e9:.2f} GB -> {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
