"""MMR diversity re-ranking (operators/rerank.py) — greedy semantics pinned
against a pure-python recomputation, plus the λ extremes."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from invertedfiles_jl_spark.operators.ann import brute_force_topk
from invertedfiles_jl_spark.operators.rerank import mmr_rerank


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))


def _cos(x, y):
    d = float(np.dot(x, y))
    return d / (math.sqrt(float(np.dot(x, x))) * math.sqrt(float(np.dot(y, y))))


def _mmr_python(vecs, qids, k, depth, lam):
    out = {}
    ids = sorted(vecs)
    for q in qids:
        rel = {d: round(_cos(vecs[q], vecs[d]), 6) for d in ids}
        cand = sorted(ids, key=lambda d: (-rel[d], d))[:depth]
        sim = {(a, b): round(_cos(vecs[a], vecs[b]), 6)
               for a in cand for b in cand if a != b}
        picked, scores = [], []
        first = min(cand, key=lambda d: (-round(rel[d], 9), d))
        picked.append(first)
        scores.append(rel[first])
        while len(picked) < min(k, len(cand)):
            best, best_key, best_mmr = None, None, None
            for d in cand:
                if d in picked:
                    continue
                m = lam * rel[d] - (1.0 - lam) * max(sim[(d, s)] for s in picked)
                key = (-round(m, 9), d)
                if best is None or key < best_key:
                    best, best_key, best_mmr = d, key, m
            picked.append(best)
            scores.append(best_mmr)
        out[q] = list(zip(picked, scores))
    return out


def test_mmr_matches_python(emb, queries, spark):
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    got = {}
    for r in mmr_rerank(emb, queries, k=5, depth=15, lam=0.7).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["mmr"]))
    want = _mmr_python(vecs, [0, 1, 2, 3], k=5, depth=15, lam=0.7)
    for q in (0, 1, 2, 3):
        mine = [(d, m) for _, d, m in sorted(got[q])]
        assert [d for d, _ in mine] == [d for d, _ in want[q]], f"query {q}"
        for (d, gm), (_, wm) in zip(mine, want[q]):
            assert gm == pytest.approx(wm, abs=1e-9), (q, d)


def test_mmr_rank1_is_top_relevance(emb, queries, spark):
    """Rank 1 must equal the plain dense ranking's rank 1 (self for
    doc-as-query: cos = 1)."""
    got = {r["query_id"]: r["doc_id"]
           for r in mmr_rerank(emb, queries, k=3, depth=10, lam=0.7).collect()
           if r["rank"] == 1}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_mmr_lambda_one_is_relevance_order(emb, queries, spark):
    """λ=1 removes the diversity term — selection order must equal the
    dense ranking."""
    want = {}
    for r in brute_force_topk(emb, queries, k=5, exclude_self=False,
                              rank_round=6).collect():
        want[(r["query_id"], r["rank"])] = r["vec_id"]
    got = mmr_rerank(emb, queries, k=5, depth=20, lam=1.0).collect()
    assert len(got) == len(want)
    for r in got:
        assert want[(r["query_id"], r["rank"])] == r["doc_id"]


def test_mmr_penalizes_redundancy(spark):
    """Hand-built geometry: q = e1; a ≈ e1 (best), b ≈ a (near-dup of a),
    c orthogonal-ish.  Plain relevance picks (a, b); MMR at λ=0.5 must pick
    (a, c) — the near-dup is displaced."""
    rows = [
        (0, [1.0, 0.0, 0.0]),        # query anchor (also a candidate)
        (1, [0.99, 0.14, 0.0]),      # a: top non-self candidate
        (2, [0.985, 0.17, 0.0]),     # b: near-duplicate of a
        (3, [0.4, 0.0, 0.9]),        # c: diverse
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0])],
                              "query_id long, q_emb array<double>")
    got = [r["doc_id"] for r in sorted(
        mmr_rerank(emb, q, k=3, depth=4, lam=0.5).collect(),
        key=lambda r: r["rank"])]
    assert got[0] == 0          # self
    assert got[1] == 1          # most relevant non-self
    assert got[2] == 3          # diversity displaces the near-dup (2)


# ---------------------------------------------------------------------------
# cross-encoder rerank seam
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ce_index(documents, spark):
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.config import IndexConfig
    from invertedfiles_jl_spark.operators.build import build_index

    corpus = documents.select("doc_id", F.col("text").alias("content"))
    return build_index(corpus, IndexConfig(weight_dtype="double")), corpus


def test_ce_rerank_stub_reorders_within_candidates(ce_index, spark):
    """Stub-ranked top-k is a subset of the BM25 top-depth candidate set
    for the same query, ordered by the stub key."""
    from invertedfiles_jl_spark.operators.rerank import crossencoder_rerank
    from invertedfiles_jl_spark.operators.search import bm25_topk
    from invertedfiles_jl_spark.sources.queries import queries_df

    idx, corpus = ce_index
    q = queries_df(spark)
    res = crossencoder_rerank(idx, corpus, q, k=5, depth=20)
    cands: dict = {}
    for r in bm25_topk(idx, q, k=20, rank_round=6).collect():
        cands.setdefault(r["query_id"], set()).add(r["doc_id"])
    per: dict = {}
    for r in res.collect():
        per.setdefault(r["query_id"], []).append(r)
        assert r["doc_id"] in cands[r["query_id"]]
        assert 0.0 <= r["ce_score"] <= 1.0
    for qid, rows in per.items():
        rows.sort(key=lambda r: r["rank"])
        keys = [(round(r["ce_score"], 6), -r["doc_id"]) for r in rows]
        assert keys == sorted(keys, reverse=True), qid


def test_ce_rerank_custom_scorer_hook(ce_index, spark):
    """The mapInPandas scorer hook drives the ranking: a fake model scoring
    by doc-text length must produce exactly the longest-doc-first order
    within each query's candidate set."""
    from invertedfiles_jl_spark.operators.rerank import crossencoder_rerank
    from invertedfiles_jl_spark.operators.search import bm25_topk
    from invertedfiles_jl_spark.sources.queries import queries_df

    idx, corpus = ce_index
    q = queries_df(spark)

    def fake_model(pdf):
        return pdf["doc_content"].str.len() / 10000.0

    res = crossencoder_rerank(idx, corpus, q, k=5, depth=20,
                              scorer=fake_model)
    lens = {r["doc_id"]: len(r["content"]) for r in corpus.collect()}
    cands: dict = {}
    for r in bm25_topk(idx, q, k=20, rank_round=6).collect():
        cands.setdefault(r["query_id"], []).append(r["doc_id"])
    got: dict = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    for qid, docs in cands.items():
        want = sorted(docs, key=lambda d: (-round(lens[d] / 10000.0, 6), d))[:5]
        assert [d for _, d in sorted(got[qid])] == want, qid
