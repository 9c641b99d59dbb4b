#!/usr/bin/env python
"""Cross-cell Plan A scaling diagnostic.

Times the 500-query BM25 Plan A batch (plus its sub-phases) at one
(cores, docs) cell; run it at the weak pair AND the cross cell to
attribute any weak-scaling deficit:

    python tools/planA_cells.py gen          # corpora to /dev/shm once
    taskset -c 0-3  python tools/planA_cells.py 4  20000
    taskset -c 0-15 python tools/planA_cells.py 16 80000
    taskset -c 0-15 python tools/planA_cells.py 16 20000   # cross cell

If the cross cell (4× cores, SAME docs) is fast, the 16-core level is
not overhead-bound and any weak deficit is data-volume-driven (DRAM
traffic on this shared-memory VM) rather than fixed cost or plan shape.
08-21 measurement: 4c/20k 3.51 s, 16c/80k 4.51 s (weak 0.78),
16c/20k 1.42 s — deficit is DRAM-traffic-driven; see BENCH/BASELINE.md.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from invertedfiles_jl_spark.config import IndexConfig  # noqa: E402
from invertedfiles_jl_spark.session import get_spark  # noqa: E402

CORPORA = {20000: "/dev/shm/planA_c20k", 80000: "/dev/shm/planA_c80k"}


def main() -> None:
    from invertedfiles_jl_spark.operators.search import (
        _bm25_qterms,
        _bm25_scored,
        _matched,
        bm25_topk,
    )
    from invertedfiles_jl_spark.plans.pipeline import (
        build_checkpointed,
        load_index,
    )
    from invertedfiles_jl_spark.sources.synth import synth_corpus, synth_queries

    if sys.argv[1] == "gen":
        spark = get_spark("gen", master="local[16]")
        spark.sparkContext.setLogLevel("ERROR")
        for n, p in CORPORA.items():
            synth_corpus(spark, n).write.mode("overwrite").parquet(p)
        print("corpora ready:", CORPORA)
        return

    cpus, n_docs = int(sys.argv[1]), int(sys.argv[2])
    os.environ["SPARK_GRAFT_JVM_STABLE"] = "1"
    spark = get_spark(f"cell-{cpus}-{n_docs}", master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="planA_cell_", dir="/dev/shm")
    corpus = spark.read.parquet(CORPORA[n_docs])
    # JIT warm build (same protocol as bench.run_scaling_job)
    build_checkpointed(corpus.limit(5000), f"{tmp}/warm",
                       IndexConfig(weighting="bm25"), resume=False)
    build_checkpointed(corpus, f"{tmp}/idx", IndexConfig(weighting="bm25"),
                       resume=False)
    idx = load_index(spark, f"{tmp}/idx")
    qdf = synth_queries(spark, 500)

    def timeit(df, reps=3):
        df.count()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df.count()
            ts.append(time.perf_counter() - t0)
        return round(min(ts), 3)

    print(json.dumps({
        "cell": f"{cpus}c_{n_docs}d",
        "planA_500q": timeit(bm25_topk(idx, qdf, k=10)),
        "matched_explode_only": timeit(_matched(idx, _bm25_qterms(idx, qdf)),
                                       reps=2),
        "scored_no_topk": timeit(_bm25_scored(idx, qdf, with_matches=False),
                                 reps=2),
    }))


if __name__ == "__main__":
    main()
