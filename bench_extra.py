#!/usr/bin/env python
"""Per-query isolation harness for the r06 optimization round
(guide §1.4): times each declared headliner/aux query with the noop
sink (computation only, no driver collect) AND with .collect() (the
frozen bench's methodology), so the two costs are attributable
separately, and dumps .explain('formatted') for the plan record.

NOT part of the frozen measurement contract — bench.py is the
driver's artifact; this file exists so OPTIMIZATION_r06.md can cite
noop-isolated numbers per guide §1.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      [--plans-dir plans/r06 --suffix _before] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_per_customer",
    "sessionize_events",
    "dedup_minhash_lsh",
    "ann_brute_force",
    "doc_quality",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    from nidaba_spark.plans import pandas_ops, relational, trainingdata
    from nidaba_spark.session import get_spark

    spark = get_spark(app="nidaba-bench-extra", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    all_q = {**pandas_ops.QUERIES, **relational.QUERIES, **trainingdata.QUERIES}

    out: dict[str, dict] = {}
    for name in names:
        fn = all_q[name]
        df = fn(spark, SF_DIR)
        spark.sparkContext.setJobDescription(f"isolate: {name}")
        # warm once (scan caches, codegen)
        df.write.format("noop").mode("overwrite").save()
        t_noop = min(
            _timed(lambda: df.write.format("noop").mode("overwrite").save())
            for _ in range(args.reps)
        )
        rows = None
        t_collect = min(
            _timed(lambda: _count_collect(df)) for _ in range(args.reps)
        )
        rows = len(df.collect())
        out[name] = {
            "noop_sec": round(t_noop, 3),
            "collect_sec": round(t_collect, 3),
            "rows": rows,
        }
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            p = os.path.join(args.plans_dir, f"{name}{args.suffix}.txt")
            with open(p, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        print(name, json.dumps(out[name]), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": SF_DIR, "isolate": out}))
    spark.stop()


def _count_collect(df) -> int:
    return len(df.collect())


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
