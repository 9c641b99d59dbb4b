#!/usr/bin/env python
"""Dump .explain("formatted") for the serving plans over a PERSISTED index —
the raw material for docs/PLANS.md (run after any query-path change)."""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.search import bm25_topk
from invertedfiles_jl_spark.operators.sharded import load_shards, shard_postings, sharded_topk
from invertedfiles_jl_spark.operators.wand import wand_topk
from invertedfiles_jl_spark.plans.pipeline import build_checkpointed, load_index
from invertedfiles_jl_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark("dump-plans", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
corpus = (spark.read.parquet(f"{SF}/documents.parquet")
          .select("doc_id", F.col("text").alias("content")))
q = spark.createDataFrame(
    [(i, t) for i, t in enumerate(["spark window merge", "sort group agg",
                                   "scan filter", "hash join table"])],
    "query_id long, content string")

tmp = tempfile.mkdtemp(prefix="ifplans_")
build_checkpointed(corpus, f"{tmp}/idx", IndexConfig(weighting="bm25"), resume=False)
idx = load_index(spark, f"{tmp}/idx")

print("=" * 30, "Plan A: bm25_topk", "=" * 30)
bm25_topk(idx, q, k=10).explain("formatted")

print("=" * 30, "Plan B: wand_topk", "=" * 30)
wand_topk(idx, q, k=10).explain("formatted")

print("=" * 30, "Plan C: sharded_topk (persisted shards)", "=" * 30)
shard_postings(idx, n_shards=8).write.mode("overwrite").parquet(f"{tmp}/shards")
sharded = load_shards(spark, f"{tmp}/shards", n_shards=8)
sharded_topk(idx, q, k=10, sharded=sharded, assume_colocated=True).explain("formatted")
