#!/usr/bin/env python
"""Memory-BANDWIDTH parallel-scaling ceiling of the sandbox VM.

`machine_ceiling.py` measures the CPU-delivery ceiling with a pure-Python
burn (tiny working set, ~zero DRAM traffic).  A shuffle/agg engine is the
opposite workload: every row moves through the memory subsystem, and on one
shared-memory VM the DRAM controllers do NOT multiply with worker count the
way they do when a real cluster adds nodes.  This tool bounds that effect:
fixed TOTAL bytes of numpy traffic (copy + sum over arrays far larger than
LLC) split across N workers — zero communication, zero shared state, so any
efficiency lost from N to 4N is the memory subsystem, not an engine.

Prints one JSON line: {"mem_ceiling": {"4->16": eff, ...}}.
"""
import json
import sys
import time
from multiprocessing import Pool

import numpy as np

ARR_MB = 256          # per-task working set: far beyond last-level cache
TASKS = 64            # fixed total work, like a fixed input table


def stream(_):
    a = np.empty(ARR_MB * 1024 * 1024 // 8, dtype=np.int64)
    a[:] = 1                      # write stream
    b = a.copy()                  # read + write stream
    return int(b.sum())           # read stream


def pair_efficiency(lo: int, hi: int, reps: int = 2) -> float:
    best = {}
    for _ in range(reps):
        for workers in (lo, hi):
            with Pool(workers) as p:
                t0 = time.perf_counter()
                p.map(stream, range(TASKS))
                t = time.perf_counter() - t0
            best[workers] = min(best.get(workers, float("inf")), t)
    return (best[lo] / best[hi]) / (hi / lo)


def main():
    pairs = [(2, 8), (4, 16)] if len(sys.argv) < 3 else [(int(sys.argv[1]), int(sys.argv[2]))]
    out = {f"{lo}->{hi}": round(pair_efficiency(lo, hi), 3) for lo, hi in pairs}
    print(json.dumps({"mem_ceiling": out}))


if __name__ == "__main__":
    main()
