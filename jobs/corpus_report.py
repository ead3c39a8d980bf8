#!/usr/bin/env python
"""Publish the dataset card for a (curated) corpus:

    spark-submit jobs/corpus_report.py --input /curated --out card.json

Two aggregation jobs at any scale (nidaba_spark/report.py)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="corpus dataset card")
    ap.add_argument("--input", required=True, help="docs parquet")
    ap.add_argument("--out", default=None, help="write JSON here (else stdout only)")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from nidaba_spark.report import corpus_report
    from nidaba_spark.session import get_spark, tune_session

    active = SparkSession.getActiveSession()
    spark = tune_session(active) if active else get_spark(
        app="nidaba-report", cores=args.cores
    )
    card = corpus_report(spark.read.parquet(args.input), text_col=args.text_col)
    out = json.dumps(card, indent=1, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    print(json.dumps(card, sort_keys=True))


if __name__ == "__main__":
    main()
