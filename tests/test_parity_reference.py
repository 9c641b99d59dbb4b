"""Ports of the reference's own test suite (/root/reference/test/invfiles.jl)
against numpy exhaustive oracles.

F3 (WeightedInvertedFile, test/invfiles.jl:9-98): dense 1000×300 normalized
uniform matrix → exact recall 1.0 at k=30; top-7 sparsified variant k=1;
allknn macrorecall 1.0 at k=3.
F4 (BinaryInvertedFile, test/invfiles.jl:114-150): vocsize=128, 10k docs,
100 queries of ≤10 sorted-unique terms → Jaccard macrorecall > 0.95 and
summed distance-vector L2 error < 0.01.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.knn import (
    allknn,
    build_vector_index,
    searchbatch_cosine,
    searchbatch_set,
)

RNG = np.random.default_rng(42)
N_DOCS, DIM = 1000, 300
N_Q = 10


@pytest.fixture(scope="module")
def dense():
    m = RNG.uniform(size=(N_DOCS, DIM))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m


@pytest.fixture(scope="module")
def dense_pairs(spark, dense):
    doc = np.repeat(np.arange(N_DOCS), DIM)
    term = np.tile(np.arange(DIM), N_DOCS)
    pdf = pd.DataFrame({"doc_id": doc, "term": term, "weight": dense.ravel()})
    return spark.createDataFrame(pdf)


def _gold_cosine(m, q, k):
    """Exhaustive normalized-cosine oracle; (dist asc, doc_id asc)."""
    d = 1.0 - q @ m.T
    out = []
    for row in d:
        order = np.lexsort((np.arange(len(row)), row))[:k]
        out.append((order, row[order]))
    return out


def _recall(gold_ids, got_ids):
    return len(set(gold_ids) & set(got_ids)) / len(gold_ids)


def test_dense_exact_recall_k30(spark, dense, dense_pairs):
    idx = build_vector_index(dense_pairs, IndexConfig(weighting="normcosine",
                                                      weight_dtype="double"))
    qsel = RNG.choice(N_DOCS, size=N_Q, replace=False)
    q = dense[qsel]
    qdoc = np.repeat(np.arange(N_Q), DIM)
    qterm = np.tile(np.arange(DIM), N_Q)
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": qdoc, "term": qterm, "qw": q.ravel()})
    )
    res = searchbatch_cosine(idx, qdf, k=30).collect()
    got = {}
    for r in res:
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["dist"]))
    gold = _gold_cosine(dense, q, 30)
    for qi in range(N_Q):
        got[qi].sort()
        ids = [d for _, d, _ in got[qi]]
        assert _recall(gold[qi][0].tolist(), ids) == 1.0, f"query {qi}"


def test_sparse_top7_recall_k1(spark, dense):
    sp = dense.copy()
    thresh = np.partition(sp, DIM - 7, axis=1)[:, DIM - 7]
    sp[sp < thresh[:, None]] = 0.0
    sp /= np.linalg.norm(sp, axis=1, keepdims=True)
    nz = sp.nonzero()
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_id": nz[0], "term": nz[1], "weight": sp[nz]})
    )
    idx = build_vector_index(pairs, IndexConfig(weighting="normcosine",
                                                weight_dtype="double"))
    qsel = RNG.choice(N_DOCS, size=N_Q, replace=False)
    q = sp[qsel]
    qnz = q.nonzero()
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": qnz[0], "term": qnz[1], "qw": q[qnz]})
    )
    res = {r["query_id"]: r["doc_id"]
           for r in searchbatch_cosine(idx, qdf, k=1).collect()}
    gold = _gold_cosine(sp, q, 1)
    for qi in range(N_Q):
        assert res[qi] == gold[qi][0][0], f"query {qi}"


def test_allknn_macrorecall_k3(spark, dense, dense_pairs):
    idx = build_vector_index(dense_pairs, IndexConfig(weighting="normcosine",
                                                      weight_dtype="double"))
    res = allknn(idx, dense_pairs, k=3).collect()
    got = {}
    for r in res:
        got.setdefault(r["query_id"], []).append(r["doc_id"])
    gold = _gold_cosine(dense, dense, 3)
    recalls = [_recall(gold[i][0].tolist(), got[i]) for i in range(N_DOCS)]
    assert float(np.mean(recalls)) == 1.0


# --------------------------------------------------------------------------
# F4: BinaryInvertedFile / Jaccard (test/invfiles.jl:114-150)
# --------------------------------------------------------------------------

VOC, N_BIN, M_BIN = 128, 10_000, 100


@pytest.fixture(scope="module")
def binsets():
    docs = [np.unique(RNG.integers(0, VOC, size=10)) for _ in range(N_BIN)]
    qs = [np.unique(RNG.integers(0, VOC, size=10)) for _ in range(M_BIN)]
    return docs, qs


def test_binary_jaccard_recall_and_fidelity(spark, binsets):
    docs, qs = binsets
    dmat = np.zeros((N_BIN, VOC), dtype=bool)
    for i, s in enumerate(docs):
        dmat[i, s] = True
    qmat = np.zeros((M_BIN, VOC), dtype=bool)
    for i, s in enumerate(qs):
        qmat[i, s] = True

    pairs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": np.repeat(np.arange(N_BIN), [len(s) for s in docs]),
            "term": np.concatenate(docs),
            "weight": 1.0,
        })
    )
    idx = build_vector_index(pairs, IndexConfig(weighting="binary"))
    qdf = spark.createDataFrame(
        pd.DataFrame({
            "query_id": np.repeat(np.arange(M_BIN), [len(s) for s in qs]),
            "term": np.concatenate(qs),
        })
    )
    res = searchbatch_set(idx, qdf, k=10, dist="jaccard").collect()
    got = {}
    for r in res:
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["dist"]))

    isize = (qmat.astype(np.int64) @ dmat.T.astype(np.int64))
    qs_sz = qmat.sum(1)[:, None]
    ds_sz = dmat.sum(1)[None, :]
    dist = 1.0 - isize / (qs_sz + ds_sz - isize)

    recalls, err = [], 0.0
    for qi in range(M_BIN):
        row = dist[qi]
        # docs with zero intersection are not candidates (inner join) —
        # exclude from gold like the reference's merge does implicitly
        order = np.lexsort((np.arange(N_BIN), row))[:10]
        got[qi].sort()
        ids = [d for _, d, _ in got[qi]]
        recalls.append(_recall(order.tolist(), ids))
        gd = row[order]
        rd = np.array([s for _, _, s in got[qi]])
        err += float(np.sqrt(np.sum((gd - rd) ** 2)))
    assert float(np.mean(recalls)) > 0.95, f"macrorecall {np.mean(recalls)}"
    assert err < 0.01, f"distance fidelity err {err}"
