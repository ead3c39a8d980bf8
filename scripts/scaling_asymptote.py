#!/usr/bin/env python
"""Amdahl decomposition of the 8v32 scaling slice.

The single-number (T_8/T_32)/4 at a fixed corpus size conflates two
things: the MARGINAL per-row cost (what a 10^12-row job is made of)
and a fixed per-job overhead (stage-barrier latency, last-wave
straggler, scan spin-up — local-mode artifacts that amortize to zero
at production scale; measured history: the same build reads 0.5 at
50k rows, ~0.84 at 300k, monotone in size). This script measures the
identical job at several corpus sizes at pinned 8 and 32 cores,
interleaved ABA per size so host drift cancels, fits
t_N(rows) = a_N + b_N * rows by least squares, and reports

  * a_N  — fixed overhead per job at each level,
  * b_N  — marginal sec/row at each level,
  * (b_8 / b_32) / 4 — the scaling efficiency of the part of the job
    that exists at 10^12-row scale.

Output: one JSON line (driver-readable) + all raw samples.
Usage: python scripts/scaling_asymptote.py [reps_per_size]
Env: NIDABA_ASYMPTOTE_SIZES="125000,250000,500000,1000000"
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_scaling as bs

SIZES = [
    int(x)
    for x in os.environ.get(
        "NIDABA_ASYMPTOTE_SIZES", "125000,250000,500000,1000000"
    ).split(",")
]
N, N4 = 8, 32

_CHILD = r"""
import json, os, sys, time
os.sched_setaffinity(0, set(range(int(os.environ["NIDABA_CORES"]))))
sys.path.insert(0, os.environ["NIDABA_REPO"])
from pyspark.sql import functions as F
from nidaba_spark import benchcorpus, pipeline
from nidaba_spark.session import get_spark
cores = int(os.environ["NIDABA_CORES"])
spark = get_spark(app=f"asym-{cores}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
cache = os.path.join(os.environ["NIDABA_REPO"], ".cache")
sizes = [int(x) for x in os.environ["NIDABA_SIZES"].split(",")]
tables = {n: benchcorpus.load_pages(spark, n, cache) for n in sizes}

def run(n):
    ext = pipeline.extract(tables[n], nsalt=256, npartitions=cores * 8)
    ext.select(F.sum(F.octet_length("text")), F.count(F.lit(1))).collect()

run(min(sizes))  # warm python pool + codegen
run(max(sizes))  # burn in the big scan
print(json.dumps({"ready": True, "in_bytes": 0}), flush=True)
for line in sys.stdin:
    cmd = line.strip().split()
    if not cmd or cmd[0] != "go":
        break
    n = int(cmd[1])
    t0 = time.perf_counter()
    run(n)
    print(json.dumps({"cores": cores, "sec": round(time.perf_counter() - t0, 3)}), flush=True)
spark.stop()
"""


def _fit(points: list[tuple[int, float]]) -> tuple[float, float]:
    """OLS fit t = a + b*rows."""
    n = len(points)
    sx = sum(p[0] for p in points)
    sy = sum(p[1] for p in points)
    sxx = sum(p[0] * p[0] for p in points)
    sxy = sum(p[0] * p[1] for p in points)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    return a, b


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    # make sure every size's corpus exists (generated at 32 cores once)
    bs.ROWS = max(SIZES)
    os.environ["NIDABA_SIZES"] = ",".join(str(s) for s in SIZES)
    import subprocess

    for s in SIZES:
        subprocess.run(
            [
                sys.executable,
                "-c",
                "import sys, os; sys.path.insert(0, os.environ['NIDABA_REPO']);"
                "from nidaba_spark import benchcorpus; from nidaba_spark.session import get_spark;"
                "s = get_spark(cores=32); s.sparkContext.setLogLevel('ERROR');"
                f"benchcorpus.ensure_corpus(s, {s}, os.path.join(os.environ['NIDABA_REPO'], '.cache')); s.stop()",
            ],
            env=dict(os.environ, NIDABA_REPO=bs.REPO),
            check=True,
            timeout=3600,
        )

    orig_child = bs._CHILD
    bs._CHILD = _CHILD
    try:
        pn, _ = bs._spawn(N)
        p4n, _ = bs._spawn(N4)
    finally:
        bs._CHILD = orig_child
    samples: list[dict] = []
    try:
        for r in range(reps):
            for size in SIZES:
                probe0 = bs._cpu_probe()
                tb_a = bs._run_once(p4n, str(size))
                ta = bs._run_once(pn, str(size))
                tb_b = bs._run_once(p4n, str(size))
                probe1 = bs._cpu_probe()
                s = {
                    "rep": r,
                    "rows": size,
                    f"t{N}": ta,
                    f"t{N4}": round((tb_a + tb_b) / 2.0, 3),
                    "eff_at_size": round((ta / ((tb_a + tb_b) / 2.0)) / 4.0, 3),
                    "cpu_probe_M_per_s": [probe0, probe1],
                }
                samples.append(s)
                print(json.dumps(s), flush=True)
    finally:
        for p in (pn, p4n):
            try:
                p.stdin.close()
                p.wait(timeout=60)
            except Exception:
                p.kill()

    # fit on per-size MEDIANS: single legs on this host can stall 2-3x
    # (shared-host spells); the median per cell is the robust estimator
    # and the fit then interpolates clean points.
    med_n = {
        size: statistics.median(s[f"t{N}"] for s in samples if s["rows"] == size)
        for size in SIZES
    }
    med_4n = {
        size: statistics.median(s[f"t{N4}"] for s in samples if s["rows"] == size)
        for size in SIZES
    }
    pts_n = sorted(med_n.items())
    pts_4n = sorted(med_4n.items())
    a_n, b_n = _fit(pts_n)
    a_4n, b_4n = _fit(pts_4n)
    result = {
        "sizes": SIZES,
        "reps": reps,
        f"fixed_overhead_sec_{N}c": round(a_n, 2),
        f"fixed_overhead_sec_{N4}c": round(a_4n, 2),
        f"marginal_us_per_row_{N}c": round(b_n * 1e6, 2),
        f"marginal_us_per_row_{N4}c": round(b_4n * 1e6, 2),
        "marginal_scaling_efficiency": round((b_n / b_4n) / 4.0, 3),
        "as_written_eff_at_each_size": {
            str(size): statistics.median(
                s["eff_at_size"] for s in samples if s["rows"] == size
            )
            for size in SIZES
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
