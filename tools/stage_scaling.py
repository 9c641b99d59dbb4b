#!/usr/bin/env python
"""Per-stage build-scaling diagnostic.

Runs the checkpointed build at two local[N] levels on the SAME pre-generated
corpus and prints each stage's wall_sec (from the lineage manifests) plus
total, and the per-stage scaling efficiency — pinpoints which stage caps the
build's N→4N efficiency.

Usage: python tools/stage_scaling.py [n_docs] [lo] [hi]
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.plans.pipeline import build_checkpointed
from invertedfiles_jl_spark.session import get_spark

cpus = %(cpus)d
spark = get_spark(f"stagescale-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(2 * cpus, 8))
spark.sparkContext.setLogLevel("ERROR")
corpus = spark.read.parquet(%(corpus)r)
# warm-up small build (codegen + python workers), same as bench protocol
build_checkpointed(corpus.limit(5000), %(tmp)r + "/warm",
                   IndexConfig(weighting="bm25"), resume=False)
t0 = time.perf_counter()
build_checkpointed(corpus, %(tmp)r + "/idx", IndexConfig(weighting="bm25"),
                   resume=False)
total = time.perf_counter() - t0
stages = {}
for st in ("termfreqs", "docs", "vocab", "postings"):
    with open(os.path.join(%(tmp)r + "/idx", st + "_lineage.json")) as f:
        stages[st] = json.load(f).get("wall_sec")
stages["total"] = round(total, 3)
stages["unattributed"] = round(total - sum(v for k, v in stages.items()
                                           if k not in ("total", "unattributed") and v), 3)
print("STAGEJSON " + json.dumps(stages))
"""


def run_level(cpus: int, corpus_path: str) -> dict:
    tmp = tempfile.mkdtemp(prefix=f"ifstage{cpus}_",
                           dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    try:
        env = dict(os.environ)
        env["SPARK_GRAFT_JVM_STABLE"] = "1"
        env.setdefault("SPARK_DRIVER_MEMORY", "24g")
        # pin JVM+GC+python workers to exactly `cpus` cores — local[N] as a
        # true N-CPU machine (same rationale as bench.py's scaling branch)
        pin = (["taskset", "-c", f"0-{cpus - 1}"]
               if shutil.which("taskset") and not os.environ.get("STAGE_NOPIN")
               else [])
        p = subprocess.run(
            pin + [sys.executable, "-c",
                   CHILD % {"repo": REPO, "cpus": cpus, "corpus": corpus_path, "tmp": tmp}],
            capture_output=True, text=True, env=env)
        for line in p.stdout.splitlines():
            if line.startswith("STAGEJSON "):
                return json.loads(line[len("STAGEJSON "):])
        sys.stderr.write(p.stdout + "\n" + p.stderr)
        raise SystemExit(f"no stage JSON at {cpus} cores")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    shared = tempfile.mkdtemp(prefix="ifstage_corpus_",
                              dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    try:
        gen = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); "
             "from invertedfiles_jl_spark.session import get_spark; "
             "from invertedfiles_jl_spark.sources.synth import synth_corpus; "
             "spark = get_spark('gen', master='local[32]'); "
             "spark.sparkContext.setLogLevel('ERROR'); "
             "synth_corpus(spark, %d).write.mode('overwrite').parquet(%r)"
             % (REPO, n_docs, os.path.join(shared, "corpus"))],
            capture_output=True, text=True)
        if gen.returncode != 0:
            sys.stderr.write(gen.stderr)
            raise SystemExit("corpus generation failed")
        cp = os.path.join(shared, "corpus")
        passes = int(os.environ.get("STAGE_PASSES", "2"))
        best: dict[int, dict] = {}
        for _ in range(passes):
            for cpus in (lo, hi):
                r = run_level(cpus, cp)
                prev = best.get(cpus)
                best[cpus] = ({k: min(v, prev[k]) for k, v in r.items()} if prev else r)
                print(f"  pass local[{cpus}]: {r}", flush=True)
        rl, rh = best[lo], best[hi]
        ratio = hi / lo
        print(f"\nstage breakdown local[{lo}] vs local[{hi}] ({n_docs} docs, min of {passes}):")
        print(f"{'stage':>14} {'lo_s':>8} {'hi_s':>8} {'eff':>6}")
        for st in ("termfreqs", "docs", "vocab", "postings", "unattributed", "total"):
            e = (rl[st] / rh[st]) / ratio if rh[st] else float("nan")
            print(f"{st:>14} {rl[st]:>8.2f} {rh[st]:>8.2f} {e:>6.2f}")
    finally:
        shutil.rmtree(shared, ignore_errors=True)


if __name__ == "__main__":
    main()
