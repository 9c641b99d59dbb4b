"""Exhaustive search + recall metrics (reference test-oracle surface,
/root/reference/test/invfiles.jl:21-27,97-98)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiny(spark):
    # 4 docs, 3 terms — hand-checkable normalized vectors
    rows = [
        (1, "a", 1.0), (1, "b", 0.0),
        (2, "a", 0.6), (2, "b", 0.8),
        (3, "b", 1.0),
        (4, "c", 1.0),
    ]
    pairs = spark.createDataFrame(
        [r for r in rows if r[2] > 0], "doc_id long, term string, weight double"
    )
    qpairs = spark.createDataFrame(
        [(1, "a", 1.0)], "query_id long, term string, qw double"
    )
    return pairs, qpairs


def test_exhaustive_includes_nonmatching_docs(spark, tiny):
    from invertedfiles_jl_spark.operators.exhaustive import exhaustive_cosine_topk

    pairs, qpairs = tiny
    res = exhaustive_cosine_topk(pairs, qpairs, k=4).collect()
    got = [(r.rank, r.doc_id, round(r.dist, 6)) for r in res]
    # q=(a) → doc1 dist 0, doc2 dist 0.4, docs 3 & 4 orthogonal at dist 1
    assert got == [(1, 1, 0.0), (2, 2, 0.4), (3, 3, 1.0), (4, 4, 1.0)]


def test_recallscore_and_macrorecall(spark):
    from invertedfiles_jl_spark.operators.exhaustive import macrorecall, recallscore

    gold = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id long, doc_id long"
    )
    res = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21)], "query_id long, doc_id long"
    )
    rs = {r.query_id: r.recall for r in recallscore(gold, res).collect()}
    assert rs == {1: 0.5, 2: 1.0}
    mr = macrorecall(gold, res).collect()[0].macrorecall
    assert abs(mr - 0.75) < 1e-12


def test_recall_zero_for_missing_query(spark):
    from invertedfiles_jl_spark.operators.exhaustive import recallscore

    gold = spark.createDataFrame([(1, 10), (2, 20)], "query_id long, doc_id long")
    res = spark.createDataFrame([(1, 10)], "query_id long, doc_id long")
    rs = {r.query_id: r.recall for r in recallscore(gold, res).collect()}
    assert rs == {1: 1.0, 2: 0.0}


def test_exhaustive_agrees_with_numpy(spark, tiny):
    """Dense brute-force in numpy vs the distributed operator."""
    from invertedfiles_jl_spark.operators.exhaustive import exhaustive_cosine_topk

    rng = np.random.default_rng(0)
    n_docs, n_terms = 40, 8
    mat = rng.random((n_docs, n_terms))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    q = rng.random(n_terms)
    q /= np.linalg.norm(q)

    pairs = spark.createDataFrame(
        [(d, str(t), float(mat[d, t])) for d in range(n_docs) for t in range(n_terms)],
        "doc_id long, term string, weight double",
    )
    qpairs = spark.createDataFrame(
        [(1, str(t), float(q[t])) for t in range(n_terms)],
        "query_id long, term string, qw double",
    )
    res = exhaustive_cosine_topk(pairs, qpairs, k=5).collect()
    got_ids = [r.doc_id for r in sorted(res, key=lambda r: r.rank)]
    dists = 1.0 - mat @ q
    want_ids = list(np.lexsort((np.arange(n_docs), dists))[:5])
    assert got_ids == want_ids


def test_allknn_skewed_hot_term(spark):
    """allknn on a skewed fixture: one term appears in EVERY doc (df = n).
    The row-granular shuffle join + AQE skew split must still produce exact
    results (vs brute force over the same pairs)."""
    import numpy as np

    from invertedfiles_jl_spark.config import IndexConfig
    from invertedfiles_jl_spark.operators.knn import allknn, build_vector_index

    n, dim = 120, 6
    rows = []
    for d in range(n):
        # hot term 0 in every doc + one rare term per doc
        vals = [(d, 0, 1.0), (d, 1 + d % dim, 2.0 + (d % 7))]
        rows.extend(vals)
    pairs = spark.createDataFrame(rows, "doc_id long, term long, weight double")
    # normalize per doc
    from pyspark.sql import functions as F

    nrm = pairs.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("weight") ** 2)).alias("nn"))
    npairs = pairs.join(nrm, "doc_id").select(
        "doc_id", "term", (F.col("weight") / F.col("nn")).alias("weight"))
    idx = build_vector_index(npairs, IndexConfig(weighting="normcosine",
                                                 weight_dtype="double",
                                                 salt_df_threshold=16,
                                                 salt_buckets=4))
    got: dict = {}
    for r in allknn(idx, npairs, k=3, rank_round=6).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["dist"]))

    # numpy brute force
    vecs = np.zeros((n, 1 + dim))
    for d in range(n):
        vecs[d, 0] = 1.0
        vecs[d, 1 + d % dim] = 2.0 + (d % 7)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vecs @ vecs.T
    for q in range(n):
        dists = 1.0 - sims[q]
        order = np.lexsort((np.arange(n), np.round(dists, 6)))[:3]
        mine = [d for _, d, _ in sorted(got[q])]
        assert mine == order.tolist(), f"q{q}: {mine} vs {order.tolist()}"


def test_allknn_df_cap_bounds_candidates_and_rescoring_is_exact(spark):
    """The df-capped allknn (prefix filtering): hot terms are excluded from
    CANDIDATE GENERATION (join rows ≤ Σ_{df ≤ cap} df² — the 100-TB bound)
    but still contribute to the RE-SCORED distances, so every emitted
    (pair, dist) matches the exact plan.  On this fixture every near pair
    shares a rare term, so the result set is identical too."""
    import numpy as np
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.config import IndexConfig
    from invertedfiles_jl_spark.operators.knn import (
        allknn,
        allknn_candidates,
        build_vector_index,
    )

    n, dim = 120, 6
    rows = []
    for d in range(n):
        rows.extend([(d, 0, 1.0), (d, 1 + d % dim, 2.0 + (d % 7))])
    pairs = spark.createDataFrame(rows, "doc_id long, term long, weight double")
    nrm = pairs.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("weight") ** 2)).alias("nn"))
    npairs = pairs.join(nrm, "doc_id").select(
        "doc_id", "term", (F.col("weight") / F.col("nn")).alias("weight"))
    idx = build_vector_index(npairs, IndexConfig(weighting="normcosine",
                                                 weight_dtype="double"))
    cap = 30  # each rare term has df = n/dim = 20 ≤ cap; hot term df = 120 > cap

    # 1. join-size bound: candidate rows == Σ_{df ≤ cap} df·qdf = Σ df²
    #    (query side = corpus) and the hot term generates nothing
    qpairs = npairs.select(F.col("doc_id").alias("query_id"), "term",
                           F.col("weight").alias("qw"))
    cand = allknn_candidates(idx, qpairs, df_cap=cap)
    dfs = {r["term"]: r["df"] for r in idx.vocab.collect()}
    bound = sum(min(d, cap) ** 2 for d in dfs.values() if d <= cap)
    assert cand.count() == bound
    assert bound < sum(d ** 2 for d in dfs.values())  # the cap actually cut

    # 2. rank AND distance identity vs the exact plan (every near pair here
    #    shares a rare term, so nothing is missed)
    exact = {(r["query_id"], r["rank"]): (r["doc_id"], r["dist"])
             for r in allknn(idx, npairs, k=3, rank_round=6).collect()}
    capped = {(r["query_id"], r["rank"]): (r["doc_id"], r["dist"])
              for r in allknn(idx, npairs, k=3, rank_round=6, df_cap=cap).collect()}
    assert capped.keys() == exact.keys()
    for key in exact:
        assert capped[key][0] == exact[key][0], key
        assert np.isclose(capped[key][1], exact[key][1]), key

    # 3. the documented recall bound: a pair sharing ONLY hot terms is
    #    invisible to candidate generation
    solo = spark.createDataFrame([(500, 0, 1.0), (501, 0, 1.0)],
                                 "doc_id long, term long, weight double")
    idx2 = build_vector_index(npairs.unionByName(solo),
                              IndexConfig(weighting="normcosine",
                                          weight_dtype="double"))
    qp2 = solo.select(F.col("doc_id").alias("query_id"), "term",
                      F.col("weight").alias("qw"))
    assert allknn_candidates(idx2, qp2, df_cap=cap).count() == 0


# ---------------------------------------------------------------------------
# graded ranking metrics
# ---------------------------------------------------------------------------


def test_ranking_metrics_match_python(spark):
    import math

    from invertedfiles_jl_spark.operators.exhaustive import ranking_metrics

    run_rows = [  # two queries; q2 has no relevant hits
        (1, 1, 10), (1, 2, 20), (1, 3, 30), (1, 4, 40),
        (2, 1, 50), (2, 2, 60),
    ]
    qrel_rows = [(1, 20, 3.0), (1, 40, 1.0), (1, 99, 2.0), (2, 99, 3.0)]
    run = spark.createDataFrame(run_rows, "query_id long, rank int, doc_id long")
    qrels = spark.createDataFrame(qrel_rows, "query_id long, doc_id long, rel double")
    got = {r["query_id"]: (r["p_at_k"], r["mrr"], r["ndcg"])
           for r in ranking_metrics(run, qrels, k=4).collect()}

    def dcg(pairs):  # (rank, rel)
        return sum((2.0 ** rel - 1.0) / (math.log(rk + 1.0) / math.log(2.0))
                   for rk, rel in pairs)

    d1 = dcg([(2, 3.0), (4, 1.0)])
    i1 = dcg([(1, 3.0), (2, 2.0), (3, 1.0)])  # ideal over q1's judged docs
    assert got[1][0] == pytest.approx(2 / 4)
    assert got[1][1] == pytest.approx(1 / 2)
    assert got[1][2] == pytest.approx(d1 / i1, abs=1e-12)
    # q2: judged doc 99 never retrieved → all zeros
    assert got[2] == (0.0, 0.0, 0.0)


def test_ranking_metrics_perfect_run_is_ndcg_one(spark):
    from invertedfiles_jl_spark.operators.exhaustive import ranking_metrics

    qrels = spark.createDataFrame(
        [(1, 7, 3.0), (1, 8, 2.0), (1, 9, 1.0)],
        "query_id long, doc_id long, rel double")
    run = spark.createDataFrame(
        [(1, 1, 7), (1, 2, 8), (1, 3, 9)],
        "query_id long, rank int, doc_id long")
    r = ranking_metrics(run, qrels, k=3).collect()[0]
    assert r["ndcg"] == pytest.approx(1.0)
    assert r["mrr"] == 1.0 and r["p_at_k"] == pytest.approx(1.0)
