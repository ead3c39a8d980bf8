#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the extraction pipeline on the bench-scale synthetic
pages corpus (the engine's reason to exist) + representative
relational / training-data queries at $SPARK_GRAFT_SF_DIR.

Timing excludes JVM/session startup and corpus generation: each query
is timed action-only (BASELINE.md note). Extra keys (docs_per_sec,
gb_per_hour, rows) ride along for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from nidaba_spark import benchcorpus, pipeline  # noqa: E402
from nidaba_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("NIDABA_BENCH_ROWS", "50000"))
CACHE_DIR = os.environ.get(
    "NIDABA_BENCH_CACHE", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
)

RELATIONAL_HEADLINERS = [
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_per_customer",
    "sessionize_events",
    "dedup_minhash_lsh",
    "ann_brute_force",
    "doc_quality",
]


def time_action(fn, reps: int = 2) -> float:
    """Best-of-N action timing: the shared host's speed drifts 2-3x
    over minutes (NOTES.md), so a single sample can tax an unlucky
    moment; min over two back-to-back runs is the standard guard and
    still measures a real end-to-end action."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark(app="nidaba-bench", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    pages_path = benchcorpus.ensure_corpus(spark, BENCH_ROWS, CACHE_DIR)
    pages = benchcorpus.load_pages(spark, BENCH_ROWS, CACHE_DIR)
    in_bytes = pages.select(F.sum(F.octet_length("html")).alias("b")).collect()[0]["b"]

    queries: dict[str, float] = {}

    # -- headline: full extraction pipeline (fused, shuffle = 1 salted repart)
    # Partition count is row-aware: ~1500 docs/partition measured best on
    # the 300k-500k scaling corpus (cores*8 there), but a 50k bench corpus
    # over-fragments at cores*8 (195 rows/task -> python batch overhead
    # dominates); clamp to [cores*2, cores*8].
    nparts = max(CPUS * 2, min(CPUS * 8, BENCH_ROWS // 1500))

    def run_pipeline():
        ext = pipeline.extract(pages, nsalt=256, npartitions=nparts)
        ext.select(
            F.sum(F.octet_length("text")), F.count(F.lit(1))
        ).collect()

    # warm-up once (JIT/codegen, python worker pool), then timed runs.
    # Pipeline gets best-of-3 (not the default 2): cold-JVM measurements
    # this host converge only on the 3rd-4th full run (r04: 15.3/10.0/
    # 4.9/5.2s back-to-back), and a single host stall poisoning the
    # headline costs a round of misleading BENCH history.
    run_pipeline()
    # best-of-4: late-r04 solo runs measured back-to-back pipeline reps
    # spreading 3.9→8.9s on the same code as host load swung (probe
    # 11 M/s mid-range) — one extra rep materially tightens the min
    # estimator under that drift for ~4s of wall.
    t_pipeline = time_action(run_pipeline, reps=4)
    queries["pipeline_extract"] = t_pipeline

    # -- relational / training-data headliners on SF_DIR
    from nidaba_spark.plans import relational, trainingdata

    all_q = {**relational.QUERIES, **trainingdata.QUERIES}
    for name in RELATIONAL_HEADLINERS:
        fn = all_q[name]
        df = fn(spark, SF_DIR)
        df.collect()  # warm: first-scan + codegen costs out of the timing
        queries[name] = time_action(lambda d=df: d.collect(), reps=3)

    total = round(sum(queries.values()), 3)
    docs_per_sec = round(BENCH_ROWS / t_pipeline, 1)
    gb_per_hour = round(in_bytes / 1e9 / (t_pipeline / 3600.0), 2)
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    # Scaling numbers republished from the last scripts/bench_scaling.py
    # measurement (BENCH/scaling_summary.json). Slices are NAMED per the
    # r03 verdict adjudication: 2v8 pinned-ABA at >=1M rows is the GATE
    # (sandbox stand-in for N vs 4N executors); 8v32 is a regression
    # canary with a 0.70 pooled-median floor.
    scaling: dict = {}
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling_summary.json")
        ) as f:
            scaling = json.load(f)
    except (OSError, ValueError):
        pass
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(m.group(1)) if m else None,
                "bench_rows": BENCH_ROWS,
                "pipeline_docs_per_sec": docs_per_sec,
                "pipeline_gb_per_hour": gb_per_hour,
                "pipeline_input_bytes": in_bytes,
                "scaling_gate_slice": scaling.get("gate_slice"),
                "scaling_efficiency_2v8": scaling.get("scaling_efficiency_2v8"),
                "scaling_efficiency_4v16": scaling.get("scaling_efficiency_4v16"),
                "scaling_canary_8v32": scaling.get("scaling_canary_8v32"),
                "scaling_canary_8v32_recheck": scaling.get("canary_recheck_8v32"),
                "scaling_canary_t32_wall_sec": scaling.get(
                    "canary_recheck_t32_clean_leg_median_sec"
                ),
                "scaling_corpus_rows": scaling.get("corpus_rows"),
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
