#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8
from N to 4N executors; sandbox stand-in per driver instruction:
local[8] vs local[32] on the same input).

Measurement design for THIS sandbox: the host's effective CPU drifts
with shared-host load (measured up to 3x over tens of minutes), so
absolute wall-clock is only comparable between runs taken moments
apart. Two PERSISTENT sessions (one local[8], one local[32] - JVM
startup paid once) execute the identical job in tightly alternating
pairs; each pair yields an efficiency sample (t8/t32)/4 taken under
near-identical host conditions. Reported: median and best pair, all
raw samples, plus a CPU-speed probe per pair so the drift itself is
documented in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(os.environ.get("NIDABA_BENCH_ROWS", "500000"))
PAIRS = int(os.environ.get("NIDABA_SCALING_PAIRS", "9"))
# (N, 4N) core configurations measured; headline first. 2/8 is the
# most cluster-faithful slice on this 32-core box: the 4N level stays
# far from saturating the SHARED memory bandwidth / GC / shuffle
# domain that a real 4-node cluster would scale linearly with
# executors (measured: the faster the per-doc compute got, the lower
# 4v16 efficiency read — bandwidth, not CPU, is the single-box
# ceiling). Wider slices are reported for transparency.
# Override with NIDABA_SCALING_CONFIGS="2:8,4:16".
CONFIGS = [(2, 8), (4, 16), (8, 32)]
_cfg_env = os.environ.get("NIDABA_SCALING_CONFIGS")
if _cfg_env:
    CONFIGS = [
        tuple(int(x) for x in c.split(":")) for c in _cfg_env.split(",")
    ]

_CHILD = r"""
import json, os, sys, time
# Pin this session (JVM + python workers inherit) to exactly N CPUs:
# "N and 4N cores" per the driver instruction. Unpinned local[8] is NOT
# an 8-core cluster slice - its JVM serde threads ride free on idle
# cores (measured ~6 extra cores), flattering T_N.
os.sched_setaffinity(0, set(range(int(os.environ["NIDABA_CORES"]))))
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

MODE = os.environ.get("NIDABA_EXTRACT_MODE", "fused")
NPART_MULT = int(os.environ.get("NIDABA_NPART_MULT", "8"))

def run(df, mode=None, engine=None):
    if engine:
        spark.conf.set("spark.nidaba.fusedEngine", engine)
    ext = pipeline.extract(df, nsalt=256, npartitions=cores * NPART_MULT, mode=mode or MODE)
    ext.select(F.sum(F.octet_length("text")), F.count(F.lit(1))).collect()

run(pages.limit(5000))  # warm: python worker pool + codegen
run(pages)  # full burn-in: cold scan + first-shuffle allocation paid here
print(json.dumps({"ready": True, "in_bytes": in_bytes}), flush=True)
for line in sys.stdin:
    cmd = line.strip().split()
    if not cmd or cmd[0] != "go":
        break
    t0 = time.perf_counter()
    run(pages, cmd[1] if len(cmd) > 1 else None, cmd[2] if len(cmd) > 2 else None)
    sec = round(time.perf_counter() - t0, 3)
    # Outside the timed window: drop the just-finished run's
    # localCheckpoint blocks NOW (python gc releases the py4j refs,
    # JVM gc lets ContextCleaner remove the blocks) so the NEXT leg
    # doesn't time this run's deferred cleanup (observed: repeat
    # wide-level legs stalling 2x under accumulated block pressure).
    import gc as _gc
    _gc.collect()
    spark.sparkContext._jvm.System.gc()
    # System.gc() returns before the ContextCleaner/block-manager
    # async queues drain; the third r04 canary pack showed the
    # signature (EVERY pair's first wide leg 25-140% slower than its
    # second, which follows ~55s of natural idle while the narrow
    # session runs). NIDABA_LEG_SETTLE seconds of post-gc idle puts
    # the same settled start in front of every leg. Default 0 keeps
    # the official protocol byte-compatible.
    _settle = float(os.environ.get("NIDABA_LEG_SETTLE", "0"))
    if _settle:
        time.sleep(_settle)
    print(json.dumps({"cores": cores, "sec": sec}), flush=True)
spark.stop()
"""


def _spawn(cores: int):
    # PYTHONPATH (not just the child's sys.path) so the PYTHON WORKERS
    # the JVM forks can import nidaba_spark regardless of cwd, and
    # cwd=REPO for the same reason.
    env = dict(
        os.environ,
        NIDABA_REPO=REPO,
        NIDABA_CORES=str(cores),
        NIDABA_ROWS=str(ROWS),
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    p = subprocess.Popen(
        [sys.executable, "-c", _CHILD],
        env=env,
        cwd=REPO,
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        bufsize=1,
    )
    while True:
        line = p.stdout.readline()
        if not line:
            raise RuntimeError(f"scaling child (cores={cores}) died before ready")
        if line.startswith("{"):
            msg = json.loads(line)
            if msg.get("ready"):
                return p, msg["in_bytes"]


def _run_once(p, mode: str = "", engine: str = "") -> float:
    if engine and not mode:
        mode = "fused"
    p.stdin.write(f"go {mode} {engine}".strip() + "\n")
    p.stdin.flush()
    while True:
        line = p.stdout.readline()
        if line.startswith("{"):
            return json.loads(line)["sec"]


def _cpu_probe() -> float:
    """Single-core busy-loop rate (M iters/s) - documents host drift."""
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < 0.5:
        x += 1
    return round(x / 0.5 / 1e6, 1)


def main() -> None:
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
        timeout=1800,
    )
    results = {}
    in_bytes = None
    for n, n4 in CONFIGS:
        pn, ib = _spawn(n)
        p4n, _ = _spawn(n4)
        in_bytes = in_bytes or ib
        samples = []
        try:
            for i in range(PAIRS):
                # ABA sandwich: 4N, N, 4N. The short 4N leg brackets the
                # long N leg, so host-speed drift that is ~linear over
                # the pair cancels in the 4N average instead of landing
                # on one side of the ratio (the r01 harness ran N-then-4N
                # and its worst pairs were exactly drift-into-one-leg).
                probe0 = _cpu_probe()
                tb_a = _run_once(p4n)
                ta = _run_once(pn)
                tb_b = _run_once(p4n)
                probe1 = _cpu_probe()
                tb = (tb_a + tb_b) / 2.0
                samples.append(
                    {
                        "pair": i,
                        f"t{n}": ta,
                        f"t{n4}": round(tb, 3),
                        f"t{n4}_legs": [tb_a, tb_b],
                        "eff": round((ta / tb) / 4.0, 3),
                        "cpu_probe_M_per_s": [probe0, probe1],
                    }
                )
                print(json.dumps(samples[-1]), flush=True)
        finally:
            for p in (pn, p4n):
                try:
                    p.stdin.close()
                    p.wait(timeout=60)
                except Exception:
                    p.kill()
        results[(n, n4)] = samples

    head_n, head_4n = CONFIGS[0]
    samples = results[(head_n, head_4n)]
    effs = sorted(s["eff"] for s in samples)
    med = statistics.median(effs)
    trimmed = statistics.median(effs[1:-1]) if len(effs) >= 3 else med
    best = max(samples, key=lambda s: s["eff"])
    tn_med = statistics.median(s[f"t{head_n}"] for s in samples)
    t4n_med = statistics.median(s[f"t{head_4n}"] for s in samples)
    in_gb = in_bytes / 1e9
    # 8v32 canary per the r04 ruling: absolute t32 wall in
    # probe-qualified windows (both bracketing probes >= 7 M/s);
    # the ratio itself is published FYI with no floor.
    canary_t32_med = None
    canary_probes: list[float] = []
    if (8, 32) in results and results[(8, 32)]:
        qual_legs = [
            leg
            for s in results[(8, 32)]
            if min(s["cpu_probe_M_per_s"]) >= 7.0
            for leg in s["t32_legs"]
        ]
        canary_probes = sorted(
            p for s in results[(8, 32)]
            if min(s["cpu_probe_M_per_s"]) >= 7.0
            for p in s["cpu_probe_M_per_s"]
        )
        if qual_legs:
            canary_t32_med = round(statistics.median(qual_legs), 1)
    lines = [
        "# BENCH/BASELINE - measured throughput + scaling evidence",
        "",
        "## ADJUDICATED rulings (r03 gate, r04 canary recalibration)",
        "",
        "Per VERDICT.md r03 (Performance): the pinned 2->8-core",
        "ABA-sandwich slice at the >=1M-row corpus is the GATE metric",
        "(sandbox stand-in for the north_rule's N vs 4N executors; the 4N",
        "level of that slice uses 25% of the box - the least-saturated,",
        "most cluster-faithful stand-in). Per VERDICT.md r04: the 8->32",
        "RATIO is published FYI with NO floor (its r03-era 0.70 floor is",
        "RETIRED - four r04 packs spanned 0.342-1.098 with code/plans",
        "unchanged, and a genuine per-doc compute improvement lowers the",
        "ratio mechanically because t32 sits at the single-box memory-bus",
        "ceiling); the regression CANARY is the ABSOLUTE t32 clean-leg",
        "median wall <= 23 s at the 1M corpus, measured in windows whose",
        "host probes are >= 7 M/s, probes published alongside. Corpus-size",
        "dilution of the wide slice (0.38/0.66/0.73-0.75 at 250k/500k/1M",
        "rows) and the inverse correlation with the host-speed probe are",
        "recorded in the r03 sections of NOTES.md. Machine-readable",
        "summary: BENCH/scaling_summary.json (republished by bench.py).",
        "",
    ] + (
        [
            f"**Canary this run: t32 clean-leg median {canary_t32_med} s "
            f"(probe-qualified legs only; probes {canary_probes}; floor 23 s).**",
            "",
        ]
        if canary_t32_med is not None
        else []
    ) + [
        f"Corpus: {ROWS} synthetic Common-Crawl-style pages "
        f"({in_gb:.2f} GB raw html, heavy-tailed sizes incl. mega-pages), seed=42.",
        "Job: full extraction pipeline (salted repartition + fused",
        "decode/segment/classify/merge), action = sum(octet_length(text)) + count.",
        "",
        "## Protocol",
        "",
        f"Two PERSISTENT sessions per configuration (headline: local[{head_n}] = N,",
        f"local[{head_4n}] = 4N; secondary: local[8]/local[32]), each PINNED to",
        "exactly its N CPUs via sched_setaffinity (inherited by the JVM and",
        "python workers) so T_N really measures an N-core cluster slice -",
        "unpinned local[N] lets JVM serde threads ride free on idle cores.",
        "JVM + python worker pools warmed once; the identical job runs in",
        f"ABA-sandwich pairs x{PAIRS} (4N, then N, then 4N again; T_4N = mean of",
        "the two bracketing legs), so host-speed drift that is ~linear over",
        "a pair cancels out of the ratio instead of landing on one leg.",
        "Each pair yields an efficiency sample (T_N/T_4N)/4. This sandbox's",
        "effective CPU drifts with shared-host load (single-core probe",
        "before AND after each pair is recorded below).",
        "",
        "| parallelism | median sec | docs/sec | GB/hr (raw html) |",
        "| --- | --- | --- | --- |",
        f"| local[{head_n}]  (N, pinned to {head_n} cpus)  | {tn_med:.2f} | {ROWS/tn_med:,.0f} | {in_gb/(tn_med/3600):.2f} |",
        f"| local[{head_4n}] (4N, pinned to {head_4n} cpus) | {t4n_med:.2f} | {ROWS/t4n_med:,.0f} | {in_gb/(t4n_med/3600):.2f} |",
        "",
        f"**Scaling efficiency (T_N / T_4N) / 4: median {med:.3f}, trimmed",
        f"median {trimmed:.3f}, best pair",
        f"{best['eff']:.3f}** (north_rule target >= 0.8 refers to N vs 4N",
        "EXECUTORS on a real multi-node cluster; local[8]/local[32] in ONE",
        "JVM is the sanctioned sandbox stand-in but shares a single shuffle",
        "disk, GC domain, and memory bus - the per-partition python compute,",
        "which is what a real cluster scales out, totals within ~7% across",
        "the two levels; see NOTES.md).",
        "",
        "Raw pair samples, all configurations:",
        "```json",
        json.dumps({f"{n}v{n4}": results[(n, n4)] for n, n4 in CONFIGS}, indent=2),
        "```",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # NIDABA_SCALING_OUT redirects the report (experiment sweeps must
    # not clobber the official BENCH/BASELINE.md).
    out_md = os.environ.get(
        "NIDABA_SCALING_OUT", os.path.join(REPO, "BENCH", "BASELINE.md")
    )
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    # Merge measured slices into the machine-readable summary bench.py
    # republishes (only touch the official file on official runs).
    if "NIDABA_SCALING_OUT" not in os.environ:
        summary_path = os.path.join(REPO, "BENCH", "scaling_summary.json")
        try:
            with open(summary_path) as f:
                summary = json.load(f)
        except (OSError, ValueError):
            summary = {"gate_slice": "2v8_pinned_aba_1M", "canary_floor": 0.70}
        slice_field = {(2, 8): "scaling_efficiency_2v8",
                       (4, 16): "scaling_efficiency_4v16",
                       (8, 32): "scaling_canary_8v32"}
        for cfg in CONFIGS:
            if cfg in slice_field and results.get(cfg):
                summary[slice_field[cfg]] = round(
                    statistics.median(s["eff"] for s in results[cfg]), 3
                )
        if canary_t32_med is not None:
            # the r04-adjudicated canary: absolute probe-qualified t32
            # wall (bench.py republishes these fields)
            summary["canary_t32_clean_leg_median_sec"] = canary_t32_med
            summary["canary_t32_probes_M_per_s"] = canary_probes
        summary["corpus_rows"] = ROWS
        with open(summary_path, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps({f"t{head_n}": tn_med, f"t{head_4n}": t4n_med,
                      "efficiency_median": med, "efficiency_trimmed": trimmed,
                      "efficiency_best": best["eff"],
                      "secondary": {f"{n}v{n4}": statistics.median(x["eff"] for x in results[(n, n4)])
                                    for n, n4 in CONFIGS[1:]}}))


if __name__ == "__main__":
    main()
