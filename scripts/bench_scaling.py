#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8
from N to 4N executors; sandbox stand-in per driver instruction:
local[8] vs local[32] on the same input).

Runs the extraction pipeline on the same cached bench corpus at both
parallelism levels (fresh JVM per run via subprocess), reports median
docs/sec at each plus efficiency = (T_8 / T_32) / 4, and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(os.environ.get("NIDABA_BENCH_ROWS", "1000000"))
RUNS = int(os.environ.get("NIDABA_SCALING_RUNS", "3"))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["NIDABA_REPO"])
from pyspark.sql import functions as F
from nidaba_spark import benchcorpus, pipeline
from nidaba_spark.session import get_spark
cores = int(os.environ["NIDABA_CORES"])
rows = int(os.environ["NIDABA_ROWS"])
spark = get_spark(app=f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
pages = benchcorpus.load_pages(spark, rows, os.path.join(os.environ["NIDABA_REPO"], ".cache"))
in_bytes = pages.select(F.sum(F.octet_length("html"))).collect()[0][0]

def run(df):
    ext = pipeline.extract(df, nsalt=256, npartitions=cores * 4)
    ext.select(F.sum(F.octet_length("text")), F.count(F.lit(1))).collect()

# warm-up on a small slice: spawns the python worker pool + codegen
# without paying a full corpus pass twice
run(pages.limit(5000))
t0 = time.perf_counter()
run(pages)
dt = time.perf_counter() - t0
print(json.dumps({"cores": cores, "sec": round(dt, 3), "rows": rows,
                  "in_bytes": in_bytes}))
spark.stop()
"""


def measure_once(cores: int) -> dict:
    env = dict(
        os.environ, NIDABA_REPO=REPO, NIDABA_CORES=str(cores), NIDABA_ROWS=str(ROWS)
    )
    r = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, capture_output=True, text=True, timeout=1200
    )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    # ensure corpus exists once (32-core JVM)
    subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys, os; sys.path.insert(0, os.environ['NIDABA_REPO']);"
            "from nidaba_spark import benchcorpus; from nidaba_spark.session import get_spark;"
            "s = get_spark(cores=32); s.sparkContext.setLogLevel('ERROR');"
            f"benchcorpus.ensure_corpus(s, {ROWS}, os.path.join(os.environ['NIDABA_REPO'], '.cache')); s.stop()",
        ],
        env=dict(os.environ, NIDABA_REPO=REPO),
        check=True,
        timeout=1200,
    )
    # INTERLEAVED pairs: this box's effective CPU drifts over minutes
    # (shared-host noise measured at up to 3x) — a back-to-back
    # local[8]/local[32] pair sees near-identical conditions, so the
    # per-pair RATIO is stable even when absolute times are not.
    # Efficiency = median of per-pair efficiencies.
    pairs = []
    for _ in range(RUNS):
        a = measure_once(8)
        b = measure_once(32)
        pairs.append((a, b, (a["sec"] / b["sec"]) / 4.0))
    res8 = [p[0] for p in pairs]
    res32 = [p[1] for p in pairs]
    eff = statistics.median(p[2] for p in pairs)
    best = max(pairs, key=lambda p: p[2])
    t8 = statistics.median(r["sec"] for r in res8)
    t32 = statistics.median(r["sec"] for r in res32)
    in_gb = res8[0]["in_bytes"] / 1e9
    lines = [
        "# BENCH/BASELINE — measured throughput + scaling evidence",
        "",
        f"Corpus: {ROWS} synthetic Common-Crawl-style pages "
        f"({in_gb:.2f} GB raw html, heavy-tailed sizes incl. mega-pages), seed=42.",
        f"Job: full extraction pipeline (salted repartition → decode → segment →",
        "classify → merge), fused, action = sum(octet_length(text)) + count.",
        "Timing excludes JVM/session startup and corpus generation; warm-up run",
        f"first, then timed run; median of {RUNS} fresh-JVM runs per level.",
        "",
        "| parallelism | median sec | docs/sec | GB/hr (raw html) |",
        "| --- | --- | --- | --- |",
        f"| local[8]  (N)  | {t8:.2f} | {ROWS/t8:,.0f} | {in_gb/(t8/3600):.2f} |",
        f"| local[32] (4N) | {t32:.2f} | {ROWS/t32:,.0f} | {in_gb/(t32/3600):.2f} |",
        "",
        f"**Scaling efficiency (T_N / T_4N) / 4 = {eff:.3f}** "
        f"(north_rule requires >= 0.8; sandbox stand-in for N vs 4N executors",
        "per driver instruction — same input, two parallelism levels).",
        "",
        f"Protocol note: runs are INTERLEAVED local[8]/local[32] pairs and",
        f"efficiency is the median of per-pair ratios ({[round(p[2],3) for p in pairs]});",
        "this sandbox's effective CPU drifts with shared-host load (measured",
        "up to 3x over tens of minutes), which per-pair ratios cancel.",
        "",
        "Raw runs:",
        "```json",
        json.dumps({"local8": res8, "local32": res32, "pair_efficiencies": [round(p[2], 3) for p in pairs]}, indent=2),
        "```",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"t8": t8, "t32": t32, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
