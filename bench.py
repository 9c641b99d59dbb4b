#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:
  * checkpointed index build wall time (all stages persisted to tmp)
  * BM25 top-10 batch throughput for 100 queries — Plan A (relational) and
    Plan B (MaxScore applyInPandas), queries served from the PERSISTED index
  * normalized-cosine and Jaccard batch query time

Scaling-efficiency mode (the north rule's two-cluster-size proxy):
  SPARK_GRAFT_SCALING=1 python bench.py
re-runs the same job in subprocesses at 8 and 32 cores on the same input and
writes BENCH/BASELINE.md with throughput at both plus efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_QUERIES = int(os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "100"))


def gen_queries(spark, n=N_QUERIES):
    """Deterministic n-query batch over the corpus vocabulary (FIXTURES F2:
    mixed hot/rare terms, no RNG)."""
    terms = ["scan", "column", "window", "order", "sort", "part", "agg", "value",
             "line", "key", "join", "merge", "query", "group", "a", "vector",
             "hash", "slow", "stream", "filter", "fast", "the", "spark", "batch",
             "table", "small", "data", "big", "customer", "row", "dup"]
    rows = []
    for i in range(n):
        k = 2 + (i % 4)  # 2..5 terms
        toks = [terms[(i * 7 + j * 3) % len(terms)] for j in range(k)]
        rows.append((i + 1, " ".join(toks)))
    return spark.createDataFrame(rows, "query_id long, content string")


def run_once(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.config import IndexConfig
    from invertedfiles_jl_spark.operators.search import bm25_topk, cosine_topk, set_distance_topk
    from invertedfiles_jl_spark.operators.wand import wand_topk
    from invertedfiles_jl_spark.plans.pipeline import build_checkpointed, load_index
    from invertedfiles_jl_spark.session import get_spark

    spark = get_spark(f"bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    corpus = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.col("text").alias("content"))
    )
    corpus.count()  # warm executors / parquet footer cache

    out = {}
    tmp = tempfile.mkdtemp(prefix="ifbench_")
    try:
        t0 = time.perf_counter()
        build_checkpointed(corpus, f"{tmp}/bm25", IndexConfig(weighting="bm25"), resume=False)
        out["build_bm25"] = time.perf_counter() - t0
        idx = load_index(spark, f"{tmp}/bm25")

        qdf = gen_queries(spark)
        t0 = time.perf_counter()
        n = bm25_topk(idx, qdf, k=10).count()
        out["bm25_planA_100q"] = time.perf_counter() - t0
        assert n > 0

        t0 = time.perf_counter()
        n = wand_topk(idx, qdf, k=10).count()
        out["bm25_wand_100q"] = time.perf_counter() - t0
        assert n > 0

        t0 = time.perf_counter()
        build_checkpointed(corpus, f"{tmp}/cos", IndexConfig(weighting="normcosine"), resume=False)
        out["build_normcosine"] = time.perf_counter() - t0
        cidx = load_index(spark, f"{tmp}/cos")
        t0 = time.perf_counter()
        cosine_topk(cidx, qdf, k=10).count()
        out["cosine_planA_100q"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        build_checkpointed(corpus, f"{tmp}/bin", IndexConfig(weighting="binary"), resume=False)
        out["build_binary"] = time.perf_counter() - t0
        bidx = load_index(spark, f"{tmp}/bin")
        t0 = time.perf_counter()
        set_distance_topk(bidx, qdf, k=10, dist="jaccard").count()
        out["jaccard_100q"] = time.perf_counter() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    out = {k: round(v, 3) for k, v in out.items()}
    return out


def main():
    if os.environ.get("SPARK_GRAFT_SCALING"):
        results = {}
        for cpus in (8, 32):
            env = dict(os.environ)
            env.pop("SPARK_GRAFT_SCALING", None)
            env["SPARK_GRAFT_CPUS"] = str(cpus)
            p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               capture_output=True, text=True, env=env)
            line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
            results[cpus] = json.loads(line)
        q8 = N_QUERIES / results[8]["queries"]["bm25_wand_100q"]
        q32 = N_QUERIES / results[32]["queries"]["bm25_wand_100q"]
        b8, b32 = results[8]["queries"]["build_bm25"], results[32]["queries"]["build_bm25"]
        eff_q = (q32 / q8) / 4.0
        eff_b = (b8 / b32) / 4.0
        md = [
            "# BENCH/BASELINE.md — measured two-parallelism scaling (local[8] vs local[32] proxy for N vs 4N executors)",
            "",
            f"Input: `{SF_DIR}` ({N_QUERIES}-query BM25 top-10 batch).",
            "",
            "| metric | local[8] | local[32] | scaling efficiency (target ≥0.8) |",
            "|---|---|---|---|",
            f"| BM25 build wall time (s) | {b8} | {b32} | {eff_b:.2f} |",
            f"| BM25 Plan B QPS | {q8:.1f} | {q32:.1f} | {eff_q:.2f} |",
            f"| BM25 Plan A 100q (s) | {results[8]['queries']['bm25_planA_100q']} | {results[32]['queries']['bm25_planA_100q']} | — |",
            "",
            "Full per-phase JSON:",
            "```json",
            json.dumps(results, indent=1),
            "```",
        ]
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "w") as f:
            f.write("\n".join(md) + "\n")
        print(json.dumps({"metric": "scaling_efficiency_bm25_qps_8to32",
                          "value": round(eff_q, 3), "unit": "ratio",
                          "queries": {"qps8": round(q8, 1), "qps32": round(q32, 1)},
                          "sf": SF_DIR}))
        return

    queries = run_once(CPUS)
    total = round(sum(queries.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(json.dumps({"metric": "build_plus_query_total_sec", "value": total,
                      "unit": "sec", "queries": queries, "sf": sf,
                      "cpus": CPUS,
                      "qps_bm25_wand": round(N_QUERIES / queries["bm25_wand_100q"], 1)}))


if __name__ == "__main__":
    main()
