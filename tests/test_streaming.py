"""Structured-Streaming micro-batch append: stream new documents into a
persisted index via foreachBatch; index must equal a batch rebuild."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.search import set_distance_topk
from invertedfiles_jl_spark.operators.build import build_index
from invertedfiles_jl_spark.plans.pipeline import build_checkpointed, load_index
from invertedfiles_jl_spark.sources.queries import queries_df
from invertedfiles_jl_spark.streaming.incremental import stream_append


def test_stream_append_equals_rebuild(spark, documents, tmp_path):
    base = documents.select("doc_id", F.col("text").alias("content"))
    h1 = base.filter(F.col("doc_id") < 400)
    h2 = base.filter(F.col("doc_id") >= 400)

    cfg = IndexConfig(weighting="binary")
    idx_path = str(tmp_path / "idx")
    build_checkpointed(h1, idx_path, cfg)

    # stream the second half in as files
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    h2.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, content string").parquet(src)
    )
    q = stream_append(spark, stream, idx_path, cfg, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    merged = load_index(spark, idx_path)
    ref = build_index(base, cfg)
    assert merged.stats["n_docs"] == ref.stats["n_docs"] == 500
    a = {(r["query_id"], r["rank"]): r["doc_id"]
         for r in set_distance_topk(merged, queries_df(spark), 10, "jaccard").collect()}
    b = {(r["query_id"], r["rank"]): r["doc_id"]
         for r in set_distance_topk(ref, queries_df(spark), 10, "jaccard").collect()}
    assert a == b
