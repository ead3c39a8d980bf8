#!/usr/bin/env python
"""Paired A/B of extract() modes under the pinned scaling protocol.

Both modes run inside the SAME ABA pair (same two persistent pinned
sessions, seconds apart), so host drift hits both alike — the only
honest way to compare modes on this drifting box. Per pair and mode:
(4N, N, 4N) legs -> efficiency sample + both absolute times.

Usage: NIDABA_BENCH_ROWS=500000 python scripts/ab_extract_modes.py [pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_scaling as bs

MODES = os.environ.get("NIDABA_AB_MODES", "fused,fused_inline").split(",")


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n, n4 = 8, 32
    pn, _ = bs._spawn(n)
    p4n, _ = bs._spawn(n4)
    out: dict[str, list[dict]] = {m: [] for m in MODES}
    try:
        for mode in MODES:  # discard round: plan-compile warmth per mode
            bs._run_once(p4n, mode)
            bs._run_once(pn, mode)
        for i in range(pairs):
            for mode in MODES:
                probe0 = bs._cpu_probe()
                tb_a = bs._run_once(p4n, mode)
                ta = bs._run_once(pn, mode)
                tb_b = bs._run_once(p4n, mode)
                probe1 = bs._cpu_probe()
                tb = (tb_a + tb_b) / 2.0
                s = {
                    "pair": i,
                    "mode": mode,
                    f"t{n}": ta,
                    f"t{n4}": round(tb, 3),
                    "eff": round((ta / tb) / 4.0, 3),
                    "cpu_probe_M_per_s": [probe0, probe1],
                }
                out[mode].append(s)
                print(json.dumps(s), flush=True)
    finally:
        for p in (pn, p4n):
            try:
                p.stdin.close()
                p.wait(timeout=60)
            except Exception:
                p.kill()
    summary = {
        m: {
            "eff_median": statistics.median(s["eff"] for s in out[m]),
            f"t{n}_median": statistics.median(s[f"t{n}"] for s in out[m]),
            f"t{n4}_median": statistics.median(s[f"t{n4}"] for s in out[m]),
        }
        for m in MODES
    }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
