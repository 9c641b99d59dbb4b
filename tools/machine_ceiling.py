#!/usr/bin/env python
"""Measure the sandbox VM's own parallel-scaling ceiling.

The north rule's criterion is ENGINE scaling efficiency between two cluster
sizes.  In this sandbox the proxy is one shared-memory VM at two local[N]
levels — so the VM's own ability to deliver 4× the CPU from N to 4N workers
caps any measurable efficiency.  This tool measures that cap with an
embarrassingly parallel pure-Python workload (fixed total work, zero
communication, zero shared state): any efficiency it loses is hypervisor
oversubscription / shared memory bandwidth, not engine behavior.

Measured on this VM (2026-08-17): 2→8 ≈ 0.89, 4→16 ≈ 0.89, 8→32 ≈ 0.64 —
the top 16 vCPUs do not deliver full cores, so 4→16 is the faithful N→4N
pair and 8→32 would measure the hypervisor, not the engine.

Prints one JSON line: {"pairs": {"4->16": eff, ...}}.
"""
import json
import sys
import time
from multiprocessing import Pool

UNIT = 3_000_000
TOTAL = 64


def burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def pair_efficiency(lo: int, hi: int, reps: int = 2) -> float:
    """Best-of-reps wall time at each level; efficiency = (t_lo/t_hi)/(hi/lo)."""
    best = {}
    for _ in range(reps):
        for workers in (lo, hi):
            with Pool(workers) as p:
                t0 = time.perf_counter()
                p.map(burn, [UNIT] * TOTAL)
                t = time.perf_counter() - t0
            best[workers] = min(best.get(workers, float("inf")), t)
    return (best[lo] / best[hi]) / (hi / lo)


def main():
    pairs = [(4, 16), (8, 32)] if len(sys.argv) < 3 else [(int(sys.argv[1]), int(sys.argv[2]))]
    out = {f"{lo}->{hi}": round(pair_efficiency(lo, hi), 3) for lo, hi in pairs}
    print(json.dumps({"machine_ceiling": out}))


if __name__ == "__main__":
    main()
