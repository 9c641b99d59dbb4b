#!/usr/bin/env python
"""One-off build experiment: run the checkpointed build once at a given
local[N] / shuffle-partition setting on a pre-generated corpus and print
per-stage wall_sec.  Corpus persists across runs at /dev/shm/ifexp_corpus.

Usage: python tools/build_exp.py CPUS SHUFFLE_PARTITIONS [n_docs]
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = "/dev/shm/ifexp_corpus"

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.plans.pipeline import build_checkpointed
from invertedfiles_jl_spark.session import get_spark

spark = get_spark("exp-%(cpus)d", master="local[%(cpus)d]",
                  shuffle_partitions=%(sp)d)
spark.sparkContext.setLogLevel("ERROR")
corpus = spark.read.parquet(%(corpus)r)
build_checkpointed(corpus.limit(5000), %(tmp)r + "/warm",
                   IndexConfig(weighting="bm25"), resume=False)
best = None
for rep in range(%(reps)d):
    t0 = time.perf_counter()
    build_checkpointed(corpus, %(tmp)r + "/idx", IndexConfig(weighting="bm25"),
                       resume=False)
    total = time.perf_counter() - t0
    stages = {}
    for st in ("termfreqs", "docs", "vocab", "postings"):
        with open(os.path.join(%(tmp)r + "/idx", st + "_lineage.json")) as f:
            stages[st] = json.load(f).get("wall_sec")
    stages["total"] = round(total, 3)
    print("REP " + json.dumps(stages), flush=True)
    best = stages if best is None else {k: min(v, best[k]) for k, v in stages.items()}
print("STAGEJSON " + json.dumps(best))
"""


def ensure_corpus(n_docs: int):
    marker = os.path.join(CORPUS, f"_n{n_docs}")
    if os.path.exists(marker):
        return
    shutil.rmtree(CORPUS, ignore_errors=True)
    gen = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from invertedfiles_jl_spark.session import get_spark; "
         "from invertedfiles_jl_spark.sources.synth import synth_corpus; "
         "spark = get_spark('gen', master='local[32]'); "
         "spark.sparkContext.setLogLevel('ERROR'); "
         "synth_corpus(spark, %d).write.mode('overwrite').parquet(%r)"
         % (REPO, n_docs, CORPUS)],
        capture_output=True, text=True)
    if gen.returncode != 0:
        sys.stderr.write(gen.stderr)
        raise SystemExit("corpus generation failed")
    open(marker, "w").close()


def main():
    cpus = int(sys.argv[1])
    sp = int(sys.argv[2])
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 400_000
    reps = int(os.environ.get("EXP_REPS", "3"))
    ensure_corpus(n_docs)
    tmp = tempfile.mkdtemp(prefix=f"ifexp{cpus}_", dir="/dev/shm")
    try:
        env = dict(os.environ)
        env["SPARK_GRAFT_JVM_STABLE"] = "1"
        env.setdefault("SPARK_DRIVER_MEMORY", "24g")
        p = subprocess.run(
            [sys.executable, "-c",
             CHILD % {"repo": REPO, "cpus": cpus, "sp": sp,
                      "corpus": CORPUS, "tmp": tmp, "reps": reps}],
            capture_output=True, text=True, env=env)
        for line in p.stdout.splitlines():
            if line.startswith("STAGEJSON "):
                print(f"local[{cpus}] sp={sp}: {line[len('STAGEJSON '):]}")
                return
        sys.stderr.write(p.stdout + "\n" + p.stderr)
        raise SystemExit("no stage JSON")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
