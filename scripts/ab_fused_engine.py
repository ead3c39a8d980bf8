#!/usr/bin/env python
"""Paired A/B of the fused stage's Python engine (mapInPandas vs
mapInArrow — VERDICT r03 next #4) under the pinned scaling protocol.

Both engines run inside the SAME ABA pair (same two persistent pinned
sessions, seconds apart), so host drift hits both alike. Per pair and
engine: (4N, N, 4N) legs -> both absolute times + efficiency sample,
so the A/B simultaneously refreshes the 8v32 canary for both engines.

Usage: NIDABA_BENCH_ROWS=1000000 python scripts/ab_fused_engine.py [pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_scaling as bs

ENGINES = ["pandas", "arrow"]


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n, n4 = (
        int(x) for x in os.environ.get("NIDABA_AB_CORES", "8:32").split(":")
    )
    pn, _ = bs._spawn(n)
    p4n, _ = bs._spawn(n4)
    out: dict[str, list[dict]] = {e: [] for e in ENGINES}
    try:
        for engine in ENGINES:  # discard round: plan-compile warmth
            bs._run_once(p4n, engine=engine)
            bs._run_once(pn, engine=engine)
        for i in range(pairs):
            for engine in ENGINES:
                probe0 = bs._cpu_probe()
                tb_a = bs._run_once(p4n, engine=engine)
                ta = bs._run_once(pn, engine=engine)
                tb_b = bs._run_once(p4n, engine=engine)
                probe1 = bs._cpu_probe()
                tb = (tb_a + tb_b) / 2.0
                s = {
                    "pair": i,
                    "engine": engine,
                    f"t{n}": ta,
                    f"t{n4}": round(tb, 3),
                    f"t{n4}_legs": [tb_a, tb_b],
                    "eff": round((ta / tb) / 4.0, 3),
                    "cpu_probe_M_per_s": [probe0, probe1],
                }
                out[engine].append(s)
                print(json.dumps(s), flush=True)
    finally:
        for p in (pn, p4n):
            try:
                p.stdin.close()
                p.wait(timeout=60)
            except Exception:
                p.kill()
    summary = {
        e: {
            f"t{n}_median": statistics.median(s[f"t{n}"] for s in ss),
            f"t{n4}_median": statistics.median(s[f"t{n4}"] for s in ss),
            "eff_median": statistics.median(s["eff"] for s in ss),
        }
        for e, ss in out.items()
    }
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
