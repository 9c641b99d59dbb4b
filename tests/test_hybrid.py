"""RRF fusion semantics (operators/hybrid.py).

The driver-gated ``hybrid_rrf_topk`` row pins the full pipeline against the
DuckDB oracle; these tests pin the fusion math itself on hand-built
rankings where the expected RRF scores are computable by eye.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.build import build_index
from invertedfiles_jl_spark.operators.hybrid import hybrid_rrf_topk, rrf_fuse


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "query_id long, rank int, doc_id long")


def test_rrf_double_listed_doc_beats_single_listed(spark):
    # doc 7 is rank 2 in BOTH lists: 2/(60+2) > 1/(60+1) → it must outrank
    # the docs that are rank 1 in only one list.
    a = _ranking(spark, [(0, 1, 1), (0, 2, 7)])
    b = _ranking(spark, [(0, 1, 2), (0, 2, 7)])
    got = rrf_fuse([a, b], k=10, rrf_k=60).orderBy("rank").collect()
    assert [r["doc_id"] for r in got] == [7, 1, 2]
    assert got[0]["n_lists"] == 2 and got[1]["n_lists"] == 1
    assert got[0]["rrf"] == pytest.approx(2 / 62)
    assert got[1]["rrf"] == pytest.approx(1 / 61)


def test_rrf_tie_breaks_by_doc_id(spark):
    # docs 5 and 3 both appear only at rank 1 (equal rrf) → doc_id asc wins
    a = _ranking(spark, [(0, 1, 5)])
    b = _ranking(spark, [(0, 1, 3)])
    got = rrf_fuse([a, b], k=10).orderBy("rank").collect()
    assert [r["doc_id"] for r in got] == [3, 5]


def test_rrf_per_query_isolation(spark):
    a = _ranking(spark, [(0, 1, 1), (1, 1, 2)])
    got = rrf_fuse([a], k=10).collect()
    by_q = {r["query_id"]: r["doc_id"] for r in got}
    assert by_q == {0: 1, 1: 2}


def test_hybrid_self_doc_ranks_first(spark, documents, sf_dir):
    """Doc-as-query: the query document itself is the top BM25 hit AND the
    top cosine hit (cos=1 with itself), so it must fuse to rank 1."""
    corpus = documents.select("doc_id", F.col("text").alias("content"))
    idx = build_index(corpus, IndexConfig(weighting="bm25", weight_dtype="double"))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tq = corpus.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "content")
    vq = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    got = hybrid_rrf_topk(idx, emb, tq, vq, k=5, depth=10).collect()
    top = {r["query_id"]: r for r in got if r["rank"] == 1}
    for q in (0, 1, 2):
        assert top[q]["doc_id"] == q
        assert top[q]["n_lists"] == 2
        # dense side: cos(self)=1 ⇒ rank 1 ⇒ contributes exactly 1/61;
        # sparse side: self is somewhere in the top-10 (BM25 does not
        # guarantee self-retrieval at rank 1), contributing 1/61..1/70.
        assert 1 / 61 + 1 / 70 <= top[q]["rrf"] <= 2 / 61


# ---------------------------------------------------------------------------
# minmax_fuse (score-based fusion)
# ---------------------------------------------------------------------------

from invertedfiles_jl_spark.operators.hybrid import hybrid_minmax_topk, minmax_fuse


def _scored(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, score double")


def test_minmax_normalizes_per_query_list(spark):
    # list a: scores 10/5/0 → norms 1.0/0.5/0.0; list b: 2/1 → 1.0/0.0.
    # alpha=0.5: doc 1 = .5·1 + .5·0 = .5, doc 2 = .5·.5 + .5·1 = .75,
    # doc 3 = .5·0 = 0 → order 2, 1, 3.
    a = _scored(spark, [(0, 1, 10.0), (0, 2, 5.0), (0, 3, 0.0)])
    b = _scored(spark, [(0, 2, 2.0), (0, 1, 1.0)])
    got = minmax_fuse([a, b], weights=[0.5, 0.5], k=10).orderBy("rank").collect()
    assert [r["doc_id"] for r in got] == [2, 1, 3]
    assert got[0]["fused"] == pytest.approx(0.75)
    assert got[1]["fused"] == pytest.approx(0.5)
    assert got[2]["fused"] == pytest.approx(0.0)
    assert got[0]["n_lists"] == 2 and got[2]["n_lists"] == 1


def test_minmax_constant_list_norms_to_one(spark):
    # a single-score list (hi == lo) must contribute its full weight, not NaN
    a = _scored(spark, [(0, 4, 3.5), (0, 9, 3.5)])
    got = minmax_fuse([a], weights=[1.0], k=10).orderBy("rank").collect()
    assert [(r["doc_id"], r["fused"]) for r in got] == [(4, 1.0), (9, 1.0)]


def test_minmax_alpha_one_reduces_to_sparse_order(spark, documents, sf_dir):
    """alpha=1 zeroes the dense contribution — the fused ranking must equal
    the BM25 ranking's order (norm is monotone in score)."""
    from invertedfiles_jl_spark.operators.search import bm25_topk

    corpus = documents.select("doc_id", F.col("text").alias("content"))
    idx = build_index(corpus, IndexConfig(weighting="bm25", weight_dtype="double"))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tq = corpus.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "content")
    vq = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    got = hybrid_minmax_topk(idx, emb, tq, vq, k=5, depth=10, alpha=1.0)
    sparse = bm25_topk(idx, tq, k=10, rank_round=6)
    want = {(r["query_id"], r["rank"]): r["doc_id"]
            for r in sparse.filter(F.col("rank") <= 5).collect()}
    # dense-only docs contribute 0 under alpha=1; restrict to fused docs that
    # appear in the sparse list (positive fused score)
    for r in got.filter(F.col("fused") > 0).collect():
        assert want[(r["query_id"], r["rank"])] == r["doc_id"]
