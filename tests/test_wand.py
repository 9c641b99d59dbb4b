"""Plan B (MaxScore) rank-identity vs Plan A and the brute-force oracle —
the north rule's Plan-equivalence gate, incl. the compressed-postings path."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.build import build_index
from invertedfiles_jl_spark.operators.search import bm25_topk, cosine_topk
from invertedfiles_jl_spark.operators.wand import wand_cosine_topk, wand_topk
from invertedfiles_jl_spark.sources.queries import QUERY_SET, queries_df

from tests import oracle


@pytest.fixture(scope="module")
def corpus(documents):
    return documents.select("doc_id", F.col("text").alias("content"))


@pytest.fixture(scope="module")
def texts(docs_pandas):
    return dict(zip(docs_pandas["doc_id"], docs_pandas["text"]))


def _collect(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r[df.columns[-1]]))
    for q in out:
        out[q].sort()
    return out


@pytest.mark.parametrize("compress", [False, True])
def test_wand_bm25_rank_identical(corpus, texts, spark, compress):
    idx = build_index(corpus, IndexConfig(weighting="bm25", compress=compress,
                                          weight_dtype="double"))
    plan_a = _collect(bm25_topk(idx, queries_df(spark), k=10))
    plan_b = _collect(wand_topk(idx, queries_df(spark), k=10))
    assert set(plan_a) == set(plan_b)
    for qid in plan_a:
        assert [d for _, d, _ in plan_a[qid]] == [d for _, d, _ in plan_b[qid]], f"q{qid}"
        for (_, _, sa), (_, _, sb) in zip(plan_a[qid], plan_b[qid]):
            assert math.isclose(sa, sb, rel_tol=1e-9, abs_tol=1e-12)
    # and against the oracle
    for qid, qtext in QUERY_SET:
        gold = oracle.topk_of(oracle.bm25_scores(texts, qtext), 10, ascending=False)
        assert [d for _, d, _ in plan_b.get(qid, [])] == [d for d, _ in gold], f"q{qid}"


def test_wand_cosine_rank_identical(corpus, texts, spark):
    idx = build_index(corpus, IndexConfig(weighting="normcosine", weight_dtype="double"))
    plan_b = _collect(wand_cosine_topk(idx, queries_df(spark), k=10))
    for qid, qtext in QUERY_SET:
        gold = oracle.topk_of(oracle.cosine_dists(texts, qtext), 10, ascending=True)
        mine = plan_b.get(qid, [])
        assert [d for _, d, _ in mine] == [d for d, _ in gold], f"q{qid}"
        for (_, _, s), (_, gs) in zip(mine, gold):
            assert abs(s - gs) < 1e-9


def test_wand_pruning_engages(corpus, spark):
    """With k=1 the suffix-bound prune must fire on multi-term queries —
    assert via identical results AND that a tiny-k search touches fewer
    candidates (indirect: result equality is the safety gate; this test
    pins the k=1 path)."""
    idx = build_index(corpus, IndexConfig(weighting="bm25", weight_dtype="double"))
    a = _collect(bm25_topk(idx, queries_df(spark), k=1))
    b = _collect(wand_topk(idx, queries_df(spark), k=1))
    assert a == b or all(
        [d for _, d, _ in a[q]] == [d for _, d, _ in b[q]] for q in a
    )
