"""TF-stage plan experiment: raw-doc shuffle (current) vs pairs shuffle.

Variant A (current ``doc_term_freqs``): repartition(doc_id) moves RAW
document rows, then explode+groupBy(doc_id, term) runs with no further
exchange — shuffle bytes = the corpus text.

Variant B: no repartition; explode straight off the scan and let Catalyst
place the exchange AFTER the partial aggregation — shuffle bytes = the
(doc_id, term, tf) pairs (each pair once: a doc's row lives in one scan
partition, so map-side combine already finalizes its counts).

Measures the full tf stage (tokenize → parquet write) at pinned local[lo]
and local[hi] on one shared synthetic corpus, min over reps, and prints
wall + scaling efficiency per variant.

Usage: python tools/tf_plan_exp.py [n_docs] [lo] [hi] [reps]
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.build import doc_term_freqs, term_id_col
from invertedfiles_jl_spark.functions.tokenize import exploded_terms
from invertedfiles_jl_spark.session import get_spark

cpus = %(cpus)d
spark = get_spark(f"tfexp-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(2 * cpus, 8))
spark.sparkContext.setLogLevel("ERROR")
cfg = IndexConfig(weighting="bm25")
corpus = spark.read.parquet(%(corpus)r)

def variant_a(c):
    return doc_term_freqs(c, cfg)

def variant_b(c):
    toks = exploded_terms(c, "doc_id", "doc_id", "content", cfg)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    return tf.withColumn("term_id", term_id_col(F.col("term")))

fns = {"A_docshuffle": variant_a, "B_pairshuffle": variant_b}
# warm-up: small pass of each variant (codegen + python workers)
for name, fn in fns.items():
    fn(corpus.limit(2000)).write.mode("overwrite").parquet(%(tmp)r + "/warm_" + name)
best = {}
for rep in range(%(reps)d):
    for name, fn in fns.items():
        t0 = time.perf_counter()
        fn(corpus).write.mode("overwrite").parquet(%(tmp)r + "/tf_" + name)
        w = time.perf_counter() - t0
        best[name] = min(w, best.get(name, 1e9))
print("TFJSON " + json.dumps({k: round(v, 3) for k, v in best.items()}))
"""


def pin(cpus):
    return (["taskset", "-c", f"0-{cpus - 1}"] if shutil.which("taskset") else [])


def run_level(cpus, corpus, reps):
    tmp = tempfile.mkdtemp(prefix=f"tfexp{cpus}_",
                           dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    try:
        env = dict(os.environ)
        env["SPARK_GRAFT_JVM_STABLE"] = "1"
        env.setdefault("SPARK_DRIVER_MEMORY", "24g")
        code = CHILD % {"repo": REPO, "cpus": cpus, "corpus": corpus,
                        "tmp": tmp, "reps": reps}
        p = subprocess.run(pin(cpus) + [sys.executable, "-c", code],
                           capture_output=True, text=True, env=env)
        for line in p.stdout.splitlines():
            if line.startswith("TFJSON "):
                return json.loads(line[7:])
        sys.stderr.write(p.stdout + "\n" + p.stderr)
        raise SystemExit(f"level {cpus} failed")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    shared = tempfile.mkdtemp(prefix="tfexp_corpus_",
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
             % (REPO, n_docs, shared + "/c")],
            capture_output=True, text=True)
        if gen.returncode != 0:
            sys.stderr.write(gen.stderr)
            raise SystemExit("corpus generation failed")
        res = {}
        for cpus in (lo, hi):
            res[cpus] = run_level(cpus, shared + "/c", reps)
            print(f"local[{cpus}]: {res[cpus]}", flush=True)
        for name in res[lo]:
            eff = res[lo][name] / res[hi][name] / (hi / lo)
            print(f"{name}: eff {lo}->{hi} = {eff:.2f}")
    finally:
        shutil.rmtree(shared, ignore_errors=True)


if __name__ == "__main__":
    main()
