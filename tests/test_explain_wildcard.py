"""Wildcard term expansion and BM25 score explanation — each checked
against a pure-python recomputation from the raw texts."""

from __future__ import annotations

import fnmatch
import math
from collections import Counter

import pytest

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.build import build_index
from invertedfiles_jl_spark.operators.search import (
    bm25_topk,
    explain_bm25,
    wildcard_topk,
)
from invertedfiles_jl_spark.sources.queries import (
    QUERY_SET,
    WILDCARD_SET,
    queries_df,
    wildcards_df,
)


@pytest.fixture(scope="module")
def texts(docs_pandas):
    return dict(zip(docs_pandas["doc_id"], docs_pandas["text"]))


@pytest.fixture(scope="module")
def corpus(documents):
    from pyspark.sql import functions as F

    return documents.select("doc_id", F.col("text").alias("content"))


@pytest.fixture(scope="module")
def bm25_index(corpus):
    return build_index(corpus, IndexConfig(weighting="bm25",
                                           weight_dtype="double"))


# ---------------------------------------------------------------------------
# wildcard expansion
# ---------------------------------------------------------------------------


def _doc_terms(texts):
    return {d: set(t.lower().split()) for d, t in texts.items()}


def test_wildcard_matches_python(bm25_index, texts, spark):
    """n_terms per (pattern, doc) == fnmatch count over the doc's distinct
    terms; ranking = n_terms desc, doc_id asc."""
    got = {}
    for r in wildcard_topk(bm25_index, wildcards_df(spark), k=10).collect():
        got[(r["query_id"], r["rank"])] = (r["doc_id"], r["n_terms"])
    dts = _doc_terms(texts)
    for qid, pat in WILDCARD_SET:
        scored = []
        for d, ts in dts.items():
            n = sum(1 for t in ts if fnmatch.fnmatchcase(t, pat))
            if n:
                scored.append((-n, d))
        scored.sort()
        for rank, (negn, d) in enumerate(scored[:10], start=1):
            assert got[(qid, rank)] == (d, -negn), (qid, pat, rank)
    # OOV pattern contributes zero rows
    oov = [q for q, p in WILDCARD_SET if p.startswith("zzz")]
    assert oov and all(k[0] != oov[0] for k in got)


def test_wildcard_escapes_like_metachars(bm25_index, spark):
    """LIKE metacharacters in the pattern are literals: '_' must NOT act as
    single-char wildcard ('va_ue' matches nothing even though LIKE va_ue
    would match 'value'), and a starless pattern is an exact term match."""
    pats = spark.createDataFrame(
        [(1, "va_ue"), (2, "value"), (3, "v%e")],
        "query_id long, pattern string")
    rows = wildcard_topk(bm25_index, pats, k=5).collect()
    qids = {r["query_id"] for r in rows}
    assert 1 not in qids, "'_' leaked through as a LIKE wildcard"
    assert 3 not in qids, "'%' leaked through as a LIKE wildcard"
    assert 2 in qids, "exact starless pattern must match its own term"


# ---------------------------------------------------------------------------
# BM25 explain
# ---------------------------------------------------------------------------


def test_explain_sums_to_topk_score(bm25_index, spark):
    """Σ contrib over a doc's explain rows == its bm25_topk score, and the
    (query, rank, doc) triples agree exactly."""
    q = queries_df(spark)
    top = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"])
           for r in bm25_topk(bm25_index, q, k=10, rank_round=6).collect()}
    acc: dict = {}
    for r in explain_bm25(bm25_index, q, k=10, rank_round=6).collect():
        key = (r["query_id"], r["doc_id"])
        s, rk = acc.get(key, (0.0, r["rank"]))
        assert rk == r["rank"]
        acc[key] = (s + r["contrib"], r["rank"])
    assert set(acc) == set(top)
    for key, (s, rk) in acc.items():
        assert rk == top[key][0]
        assert math.isclose(s, top[key][1], rel_tol=1e-9, abs_tol=1e-12)


def test_explain_factors_match_python(bm25_index, texts, spark):
    """idf/sat_tf/qtf recomputed from the raw texts (k1=1.2, b=0.75)."""
    k1, b = 1.2, 0.75
    tfs = {d: Counter(t.lower().split()) for d, t in texts.items()}
    n = float(len(tfs))
    avgdl = sum(sum(c.values()) for c in tfs.values()) / n
    df = Counter(t for c in tfs.values() for t in c)
    rows = explain_bm25(bm25_index, queries_df(spark), k=10,
                        rank_round=6).collect()
    assert rows
    qtfs = {qid: Counter(text.lower().split()) for qid, text in QUERY_SET}
    for r in rows:
        term, d = r["term"], r["doc_id"]
        tf = tfs[d][term]
        assert tf > 0, "explain row for a term the doc lacks"
        dl = sum(tfs[d].values())
        sat = tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
        idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
        assert r["qtf"] == qtfs[r["query_id"]][term]
        assert math.isclose(r["sat_tf"], sat, rel_tol=1e-9)
        assert math.isclose(r["idf"], idf, rel_tol=1e-9)
        assert math.isclose(r["contrib"], r["qtf"] * idf * sat, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# regex term search
# ---------------------------------------------------------------------------


def test_regex_matches_python(bm25_index, texts, spark):
    import re

    from invertedfiles_jl_spark.operators.search import regex_topk
    from invertedfiles_jl_spark.sources.queries import REGEX_SET, regexes_df

    got = {}
    for r in regex_topk(bm25_index, regexes_df(spark), k=10_000).collect():
        got.setdefault(r["query_id"], {})[r["doc_id"]] = r["n_terms"]
    for qid, pat in REGEX_SET:
        rx = re.compile(pat)
        want = {}
        for d, t in texts.items():
            n = len({w for w in set(t.lower().split()) if rx.fullmatch(w)})
            if n:
                want[d] = n
        assert got.get(qid, {}) == want, f"pattern {pat!r}"


def test_regex_oov_yields_zero_rows(bm25_index, spark):
    from invertedfiles_jl_spark.operators.search import regex_topk

    q = spark.createDataFrame([(1, "zzz.*")], "query_id long, pattern string")
    assert regex_topk(bm25_index, q, k=10).count() == 0


# ---------------------------------------------------------------------------
# term vectors (forward doc view)
# ---------------------------------------------------------------------------


def test_term_vectors_match_python(bm25_index, corpus, texts, spark):
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.operators.search import term_vectors

    ids = sorted(texts)[:6]
    src = spark.createDataFrame([(d,) for d in ids], "doc_id long")
    got = {(r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf"])
           for r in term_vectors(bm25_index, corpus, src).collect()}
    tf = {d: Counter(t.lower().split()) for d, t in texts.items()}
    df = Counter(t for c in tf.values() for t in set(c))
    n = len(tf)
    want = {}
    for d in ids:
        for t, c in tf[d].items():
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            want[(d, t)] = (c, df[t], c * idf)
    assert set(got) == set(want)
    for key, (wtf, wdf, wtfidf) in want.items():
        gtf, gdf, gtfidf = got[key]
        assert (gtf, gdf) == (wtf, wdf)
        assert gtfidf == pytest.approx(wtfidf, abs=1e-9)
