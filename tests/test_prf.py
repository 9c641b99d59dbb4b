"""Pseudo-relevance feedback — hand-corpus recall widening + python mirror
of the expanded scoring, plus the OOV empty contract."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.build import build_index
from invertedfiles_jl_spark.operators.search import bm25_topk, prf_bm25_topk
from invertedfiles_jl_spark.sources.queries import queries_df


HAND = [
    (1, "apple banana"),
    (2, "banana cherry"),
    (3, "apple"),
    (4, "cherry date"),
    (5, "banana banana date"),
]


@pytest.fixture(scope="module")
def hand_corpus(spark):
    return spark.createDataFrame(HAND, "doc_id long, content string")


@pytest.fixture(scope="module")
def hand_index(hand_corpus):
    return build_index(hand_corpus,
                       IndexConfig(weighting="bm25", weight_dtype="double"))


def _py_bm25_weights(texts, k1=1.2, b=0.75):
    tfs = {d: Counter(t.split()) for d, t in texts}
    n = float(len(tfs))
    avgdl = sum(sum(c.values()) for c in tfs.values()) / n
    df = Counter(t for c in tfs.values() for t in c)
    idf = {t: math.log(1.0 + (n - d + 0.5) / (d + 0.5)) for t, d in df.items()}
    sat = {(d, t): tf * (k1 + 1.0)
           / (tf + k1 * ((1.0 - b) + b * sum(c.values()) / avgdl))
           for d, c in tfs.items() for t, tf in c.items()}
    return tfs, idf, sat


def test_prf_widens_recall(hand_index, hand_corpus, spark):
    """Query 'apple': plain BM25 can never reach doc 2 (no 'apple'); PRF
    mines 'banana' from the feedback docs and retrieves it."""
    q = spark.createDataFrame([(1, "apple")], "query_id long, content string")
    plain = {r["doc_id"] for r in
             bm25_topk(hand_index, q, k=10, rank_round=6).collect()}
    assert plain == {1, 3}
    prf = {r["doc_id"] for r in
           prf_bm25_topk(hand_index, hand_corpus, q, k=10, fb_docs=2,
                         fb_terms=1, beta=0.5, rank_round=6).collect()}
    assert 2 in prf and 5 in prf, "expansion term 'banana' must pull in docs 2 and 5"
    assert plain < prf


def test_prf_scores_match_python(hand_index, hand_corpus, spark):
    """Mirror the full two-pass arithmetic on the hand corpus."""
    fb_docs, fb_terms, beta = 2, 1, 0.5
    q = spark.createDataFrame([(1, "apple")], "query_id long, content string")
    tfs, idf, sat = _py_bm25_weights(HAND)
    # pass 1: docs 1 and 3 contain 'apple'; both score qtf*idf*sat
    p1 = sorted(((d, idf["apple"] * sat[(d, "apple")])
                 for d in (1, 3)),
                key=lambda kv: (-round(kv[1], 6), kv[0]))[:fb_docs]
    fbset = [d for d, _ in p1]
    # expansion: tf over feedback docs, minus the original term
    ftf = Counter()
    for d in fbset:
        ftf.update(tfs[d])
    del ftf["apple"]
    cand = sorted(ftf, key=lambda t: (-round(ftf[t] * idf[t], 6), t))[:fb_terms]
    assert cand == ["banana"]
    want = {}
    for d, c in tfs.items():
        s = 0.0
        if "apple" in c:
            s += 1.0 * idf["apple"] * sat[(d, "apple")]
        for t in cand:
            if t in c:
                s += beta * idf[t] * sat[(d, t)]
        if s > 0:
            want[d] = s
    got = {r["doc_id"]: r["score"]
           for r in prf_bm25_topk(hand_index, hand_corpus, q, k=10,
                                  fb_docs=fb_docs, fb_terms=fb_terms,
                                  beta=beta, rank_round=6).collect()}
    assert set(got) == set(want)
    for d, s in want.items():
        assert math.isclose(got[d], s, rel_tol=1e-9), d


def test_prf_oov_query_empty(hand_index, hand_corpus, spark):
    q = spark.createDataFrame([(9, "zzz qqq")], "query_id long, content string")
    assert prf_bm25_topk(hand_index, hand_corpus, q, k=10,
                         rank_round=6).count() == 0


def test_prf_on_fixture_differs_from_plain(documents, spark):
    """On the sf corpus, at least one query's top-10 doc set must change
    (expansion is doing something) while OOV query 10 stays empty."""
    from pyspark.sql import functions as F

    corpus = documents.select("doc_id", F.col("text").alias("content"))
    idx = build_index(corpus, IndexConfig(weighting="bm25",
                                          weight_dtype="double"))
    q = queries_df(spark)
    plain: dict = {}
    for r in bm25_topk(idx, q, k=10, rank_round=6).collect():
        plain.setdefault(r["query_id"], set()).add(r["doc_id"])
    prf: dict = {}
    for r in prf_bm25_topk(idx, corpus, q, k=10, rank_round=6).collect():
        prf.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert 10 not in prf
    assert any(prf.get(qid) != plain.get(qid) for qid in plain)
