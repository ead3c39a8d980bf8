#!/usr/bin/env python
"""Sweep spark.sql.execution.arrow.maxRecordsPerBatch for the fused
extract stage (VERDICT r03 next #5): batch size trades Python-loop
amortization against per-worker memory pinned by multi-MB html blobs.
Reuses the pinned persistent-session child from bench_scaling via
NIDABA_EXTRA_CONF; one spawn per size (JVM-start conf), 1 discard +
N timed runs each, interleaved nothing — absolute time at ONE core
count, so run it on an otherwise idle box.

Usage: NIDABA_BENCH_ROWS=1000000 NIDABA_SWEEP_CORES=32 \
       python scripts/sweep_arrow_batch.py [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_scaling as bs

SIZES = [int(x) for x in os.environ.get(
    "NIDABA_SWEEP_SIZES", "128,256,512,1024").split(",")]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cores = int(os.environ.get("NIDABA_SWEEP_CORES", "32"))
    out = {}
    for size in SIZES:
        os.environ["NIDABA_EXTRA_CONF"] = (
            f"spark.sql.execution.arrow.maxRecordsPerBatch={size}"
        )
        p, _ = bs._spawn(cores)
        try:
            bs._run_once(p)  # discard (session warmed in _spawn already)
            times = [bs._run_once(p) for _ in range(reps)]
        finally:
            try:
                p.stdin.close()
                p.wait(timeout=60)
            except Exception:
                p.kill()
        out[size] = {
            "times": times,
            "median": round(statistics.median(times), 3),
            "probe": bs._cpu_probe(),
        }
        print(json.dumps({"size": size, **out[size]}), flush=True)
    print(json.dumps({"summary": {s: v["median"] for s, v in out.items()}}))


if __name__ == "__main__":
    main()
