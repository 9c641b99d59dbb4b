"""Interleaved A/B: sharded serving kernel with MaxScore pruning vs bulk
accumulate, same session, same cached shards — isolates kernel cost from
the VM's episodic neighbor stalls (alternating reps, min + median per arm).

Usage: python tools/sharded_ab.py [n_reps] [sf_dir]
"""
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from invertedfiles_jl_spark import operators  # noqa: E402
from invertedfiles_jl_spark.config import IndexConfig  # noqa: E402
from invertedfiles_jl_spark.operators import sharded as sh  # noqa: E402
from invertedfiles_jl_spark.plans.pipeline import build_checkpointed  # noqa: E402
from invertedfiles_jl_spark.session import get_spark  # noqa: E402


def bulk_emit(per_q, k, rank_round, block_size, stats=None):
    """r2-style exact bulk accumulate (concatenate → unique → bincount)."""
    import pandas as pd

    if not per_q:
        return pd.DataFrame({"query_id": np.empty(0, np.int64),
                             "doc_id": np.empty(0, np.int64),
                             "score": np.empty(0, np.float64)})
    out_q, out_d, out_s = [], [], []
    for qid, (qws, idl, wl, bml, mwl) in per_q.items():
        all_ids = np.concatenate(idl)
        all_sc = np.concatenate([qw * w for qw, w in zip(qws, wl)])
        uids, inv = np.unique(all_ids, return_inverse=True)
        scores = np.bincount(inv, weights=all_sc, minlength=len(uids))
        key = sh._round_half_up(scores, rank_round) if rank_round is not None else scores
        sel = np.lexsort((uids, -key))[:k]
        out_q.append(np.full(len(sel), qid, dtype=np.int64))
        out_d.append(uids[sel])
        out_s.append(scores[sel])
    return pd.DataFrame({"query_id": np.concatenate(out_q),
                         "doc_id": np.concatenate(out_d),
                         "score": np.concatenate(out_s)})


def main():
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    spark = get_spark("sharded-ab", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = (spark.read.parquet(f"{sf}/documents.parquet")
              .select("doc_id", F.col("text").alias("content")))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import gen_queries

    qdf = gen_queries(spark, 100)
    tmp = tempfile.mkdtemp(prefix="shab_")
    idx = build_checkpointed(corpus, f"{tmp}/idx", IndexConfig(weighting="bm25"),
                             resume=False)
    sh.shard_postings(idx, n_shards=32).write.mode("overwrite").parquet(f"{tmp}/sh")
    shards = sh.load_shards(spark, f"{tmp}/sh", n_shards=32)
    shards.count()

    real_emit = sh._emit_topk
    arms = {"maxscore": real_emit, "bulk": bulk_emit}
    times = {a: [] for a in arms}
    # warm both arms
    for name, emit in arms.items():
        sh._emit_topk = emit
        sh.sharded_topk(idx, qdf, k=10, sharded=shards, assume_colocated=True).count()
    for rep in range(n_reps):
        for name, emit in arms.items():
            sh._emit_topk = emit
            t0 = time.perf_counter()
            sh.sharded_topk(idx, qdf, k=10, sharded=shards,
                            assume_colocated=True).count()
            times[name].append(time.perf_counter() - t0)
    sh._emit_topk = real_emit
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f} med={statistics.median(ts):.3f} "
              f"all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
