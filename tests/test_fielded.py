"""BM25F fielded scoring — python recomputation + the degeneracy property
(single content field with weight 1 ⇒ identical to plain BM25)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.build import build_index
from invertedfiles_jl_spark.operators.fielded import bm25f_topk
from invertedfiles_jl_spark.operators.search import bm25_topk
from invertedfiles_jl_spark.sources.corpus import corpus_from_documents
from invertedfiles_jl_spark.sources.queries import (
    FIELDED_SET,
    fielded_df,
    queries_df,
)


@pytest.fixture(scope="module")
def corpus(documents):
    return corpus_from_documents(documents)


@pytest.fixture(scope="module")
def corpus_pd(corpus):
    return corpus.select("doc_id", "path", "content").toPandas()


def _py_bm25f(corpus_pd, queries, fields, k1=1.2, k=10):
    """Pure-python BM25F mirror."""
    tf = {}   # (doc, field) -> Counter
    for r in corpus_pd.itertuples():
        tf[(r.doc_id, "path")] = Counter(
            t for t in re.split(r"[^a-z0-9]+", r.path.lower()) if t)
        tf[(r.doc_id, "content")] = Counter(r.content.lower().split())
    docs = sorted({d for d, _ in tf})
    n = float(len(docs))
    flen = {key: sum(c.values()) for key, c in tf.items()}
    avglen = {f: sum(flen.get((d, f), 0) for d in docs) / n
              for f, _, _ in fields}
    df = Counter()
    for d in docs:
        seen = set()
        for f, _, _ in fields:
            seen |= set(tf.get((d, f), ()))
        df.update(seen)
    out = {}
    for qid, text in queries:
        qtf = Counter(text.lower().split())
        scores = {}
        for term, qn in qtf.items():
            if term not in df:
                continue
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for d in docs:
                wtf = 0.0
                for f, w, b in fields:
                    t = tf.get((d, f), {}).get(term, 0)
                    if t:
                        wtf += w * t / (1.0 - b + b * flen[(d, f)] / avglen[f])
                if wtf:
                    scores[d] = scores.get(d, 0.0) + (
                        qn * idf * wtf * (k1 + 1.0) / (k1 + wtf))
        ranked = sorted(scores.items(),
                        key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
        for rank, (d, s) in enumerate(ranked, start=1):
            out[(qid, rank)] = (d, s)
    return out


def test_bm25f_matches_python(corpus, corpus_pd, spark):
    fields = [("path", 2.0, 0.5), ("content", 1.0, 0.75)]
    got = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"])
           for r in bm25f_topk(corpus, fielded_df(spark), k=10,
                               rank_round=6).collect()}
    want = _py_bm25f(corpus_pd, FIELDED_SET, fields)
    assert set(got) == set(want)
    for key, (d, s) in want.items():
        assert got[key][0] == d, key
        assert math.isclose(got[key][1], s, rel_tol=1e-9), key
    # OOV query yields zero rows
    assert all(q != 5 for q, _ in got)


def test_bm25f_path_hits_outrank_content_only(corpus, spark):
    """A doc whose PATH carries the query term must outrank docs that only
    carry it in the body: query 'file12' names exactly doc 12's path."""
    rows = bm25f_topk(corpus, fielded_df(spark), k=10,
                      rank_round=6).collect()
    q4 = [r for r in rows if r["query_id"] == 4]
    assert q4 and q4[0]["rank"] == 1 and q4[0]["doc_id"] == 12


def test_bm25f_degenerates_to_bm25(corpus, documents, spark):
    """fields=[('content', 1.0, 0.75)] must reproduce bm25_topk exactly
    (same ranks, same scores) — the scale-anchoring contract."""
    from pyspark.sql import functions as F

    plain = documents.select("doc_id", F.col("text").alias("content"))
    idx = build_index(plain, IndexConfig(weighting="bm25",
                                         weight_dtype="double"))
    q = queries_df(spark)
    want = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"])
            for r in bm25_topk(idx, q, k=10, rank_round=6).collect()}
    got = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"])
           for r in bm25f_topk(corpus, q, k=10,
                               fields=[("content", 1.0, 0.75)],
                               rank_round=6).collect()}
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0], key
        assert math.isclose(got[key][1], want[key][1], rel_tol=1e-9), key


# ---------------------------------------------------------------------------
# DisMax
# ---------------------------------------------------------------------------

from invertedfiles_jl_spark.operators.fielded import dismax_topk


def _py_dismax(corpus_pd, queries, fields, tie=0.3, k1=1.2, k=10):
    """Pure-python DisMax mirror: independent per-field BM25s (own df and
    length stats), per-field score rounded to 9, max + tie·rest."""
    tf = {}
    for r in corpus_pd.itertuples():
        tf[(r.doc_id, "path")] = Counter(
            t for t in re.split(r"[^a-z0-9]+", r.path.lower()) if t)
        tf[(r.doc_id, "content")] = Counter(r.content.lower().split())
    docs = sorted({d for d, _ in tf})
    n = float(len(docs))
    out = {}
    per_field = {}
    for f, w, b in fields:
        flen = {d: sum(tf[(d, f)].values()) for d in docs}
        avglen = sum(flen.values()) / n
        df = Counter()
        for d in docs:
            df.update(set(tf[(d, f)]))
        per_field[f] = (w, b, flen, avglen, df)
    for qid, text in queries:
        qtf = Counter(text.lower().split())
        sides = {}
        for f, (w, b, flen, avglen, df) in per_field.items():
            scores = {}
            for term, qn in qtf.items():
                if term not in df:
                    continue
                idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
                for d in docs:
                    t = tf[(d, f)].get(term, 0)
                    if t:
                        sat = t * (k1 + 1.0) / (t + k1 * (1.0 - b
                                                          + b * flen[d] / avglen))
                        scores[d] = scores.get(d, 0.0) + qn * idf * sat
            for d, s in scores.items():
                sides.setdefault(d, []).append(round(w * s, 9))
        combined = {d: max(ss) + tie * (sum(ss) - max(ss))
                    for d, ss in sides.items()}
        ranked = sorted(combined.items(),
                        key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
        for rank, (d, s) in enumerate(ranked, start=1):
            out[(qid, rank)] = (d, s)
    return out


def test_dismax_matches_python(corpus, corpus_pd, spark):
    from invertedfiles_jl_spark.operators.fielded import DEFAULT_FIELDS

    got = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"])
           for r in dismax_topk(corpus, fielded_df(spark), k=10, tie=0.3,
                                rank_round=6).collect()}
    want = _py_dismax(corpus_pd, FIELDED_SET, DEFAULT_FIELDS, tie=0.3)
    assert set(got) == set(want)
    for key, (wd, ws) in want.items():
        gd, gs = got[key]
        assert gd == wd, key
        assert gs == pytest.approx(ws, abs=1e-9)


def test_dismax_tie_zero_is_pure_max(corpus, corpus_pd, spark):
    """tie=0: the combined score must equal the best single field's."""
    from invertedfiles_jl_spark.operators.fielded import DEFAULT_FIELDS

    got = dismax_topk(corpus, fielded_df(spark), k=10, tie=0.0,
                      rank_round=6).collect()
    want = _py_dismax(corpus_pd, FIELDED_SET, DEFAULT_FIELDS, tie=0.0)
    for r in got:
        wd, ws = want[(r["query_id"], r["rank"])]
        assert r["doc_id"] == wd
        assert r["score"] == pytest.approx(ws, abs=1e-9)
