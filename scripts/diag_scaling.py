#!/usr/bin/env python
"""Phase-level scaling diagnosis: decompose the bench job into
scan / scan+shuffle / full-pipeline actions at pinned N and 4N cores,
alternating measurements pairwise so host drift cancels. Prints the
per-phase efficiency so the scaling-gate work targets the real
bottleneck instead of a guess.

Usage: python scripts/diag_scaling.py [rows] [n] [4n] [reps]
Env: NIDABA_LOCAL_DIR — forwarded to the child sessions (e.g. a tmpfs
path) to isolate shuffle-disk contention.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N4 = int(sys.argv[3]) if len(sys.argv) > 3 else 16
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 3

_CHILD = r"""
import json, os, sys, time
os.sched_setaffinity(0, set(range(int(os.environ["NIDABA_CORES"]))))
sys.path.insert(0, os.environ["NIDABA_REPO"])
from pyspark.sql import functions as F
from nidaba_spark import benchcorpus, pipeline
from nidaba_spark.session import get_spark
cores = int(os.environ["NIDABA_CORES"])
rows = int(os.environ["NIDABA_ROWS"])
spark = get_spark(app=f"diag-{cores}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
pages = benchcorpus.load_pages(spark, rows, os.path.join(os.environ["NIDABA_REPO"], ".cache"))

def scan():
    pages.select(F.sum(F.octet_length("html"))).collect()

mult = int(os.environ.get("NIDABA_NPART_MULT", "4"))

def shuffle():
    pipeline.prepare(pages, nsalt=256, npartitions=cores * mult).select(
        F.sum(F.octet_length("html"))).collect()

def full():
    ext = pipeline.extract(pages, nsalt=256, npartitions=cores * mult)
    ext.select(F.sum(F.octet_length("text")), F.count(F.lit(1))).collect()

PHASES = {"scan": scan, "shuffle": shuffle, "full": full}
for fn in PHASES.values():
    fn()  # warm
print(json.dumps({"ready": True}), flush=True)
for line in sys.stdin:
    phase = line.strip()
    if phase not in PHASES:
        break
    t0 = time.perf_counter()
    PHASES[phase]()
    print(json.dumps({"sec": round(time.perf_counter() - t0, 3)}), flush=True)
spark.stop()
"""


def _spawn(cores: int):
    env = dict(os.environ, NIDABA_REPO=REPO, NIDABA_CORES=str(cores), NIDABA_ROWS=str(ROWS))
    p = subprocess.Popen(
        [sys.executable, "-c", _CHILD], env=env, stdin=subprocess.PIPE,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, bufsize=1,
    )
    while True:
        line = p.stdout.readline()
        if line.startswith("{") and json.loads(line).get("ready"):
            return p


def _run(p, phase: str) -> float:
    p.stdin.write(phase + "\n")
    p.stdin.flush()
    while True:
        line = p.stdout.readline()
        if line.startswith("{"):
            return json.loads(line)["sec"]


def main() -> None:
    pn, p4n = _spawn(N), _spawn(N4)
    out = {}
    try:
        for phase in ("scan", "shuffle", "full"):
            ts_n, ts_4n = [], []
            for _ in range(REPS):
                ts_n.append(_run(pn, phase))
                ts_4n.append(_run(p4n, phase))
            tn, t4n = statistics.median(ts_n), statistics.median(ts_4n)
            out[phase] = {
                f"t{N}": tn, f"t{N4}": t4n,
                "eff": round(tn / t4n / (N4 / N), 3),
                "raw": {f"t{N}": ts_n, f"t{N4}": ts_4n},
            }
            print(json.dumps({phase: out[phase]}), flush=True)
    finally:
        for p in (pn, p4n):
            try:
                p.stdin.close()
                p.wait(timeout=60)
            except Exception:
                p.kill()
    # derived: python-stage-only time = full - shuffle leg
    d_n = out["full"][f"t{N}"] - out["shuffle"][f"t{N}"]
    d_4n = out["full"][f"t{N4}"] - out["shuffle"][f"t{N4}"]
    print(json.dumps({"python_delta": {f"t{N}": round(d_n, 3), f"t{N4}": round(d_4n, 3),
                                       "eff": round(d_n / d_4n / (N4 / N), 3)}}))


if __name__ == "__main__":
    main()
