"""LM Dirichlet + SMART lnc.ltc scoring families, search_after cursor
pagination, per-facet top hits, and sliding-window chunking — pure-python
recomputations plus the operators' structural invariants."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.build import build_index
from invertedfiles_jl_spark.operators.packing import chunk_documents
from invertedfiles_jl_spark.operators.search import (
    bm25_topk,
    facet_top_hits,
    lm_dirichlet_topk,
    search_after_topk,
    tfidf_topk,
)

TEXTS = {
    0: "spark merge window window",
    1: "fast query table scan scan scan",
    2: "merge sort spark fast fast",
    3: "table scan filter",
    4: "window",
    5: "query query query merge table",
}
QUERIES = [(1, "spark window"), (2, "scan table fast"), (3, "query query"),
           (4, "zzzoov")]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(d, t) for d, t in TEXTS.items()], "doc_id long, content string")


@pytest.fixture(scope="module")
def tf_index(corpus):
    return build_index(corpus, IndexConfig(weighting="tf", weight_dtype="double"))


@pytest.fixture(scope="module")
def qdf(spark):
    return spark.createDataFrame(QUERIES, "query_id long, content string")


def _tfs():
    return {d: Counter(t.split()) for d, t in TEXTS.items()}


def test_lm_dirichlet_matches_python(tf_index, qdf):
    mu = 50.0  # small mu so the smoothing term actually moves ranks here
    tfs = _tfs()
    cf = Counter()
    for c in tfs.values():
        cf.update(c)
    total = sum(cf.values())
    expected = {}
    for qid, qtext in QUERIES:
        q = Counter(t for t in qtext.split() if t in cf)
        qlen = sum(q.values())
        scores = {}
        for d, c in tfs.items():
            matched = [t for t in q if t in c]
            if not matched:
                continue
            s = sum(q[t] * math.log(1.0 + c[t] * total / (mu * cf[t]))
                    for t in matched)
            s += qlen * math.log(mu / (mu + sum(c.values())))
            scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))
        expected[qid] = [(i + 1, d) for i, (d, _) in enumerate(ranked)]
    got = lm_dirichlet_topk(tf_index, qdf, k=10, mu=mu, rank_round=6).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id))
    assert by_q == {qid: rk for qid, rk in expected.items() if rk}
    assert 4 not in by_q  # fully-OOV query → empty result


def test_tfidf_matches_python(tf_index, qdf):
    tfs = _tfs()
    df = Counter()
    for c in tfs.values():
        df.update(c.keys())
    n = float(len(TEXTS))
    lnc_norm = {d: math.sqrt(sum((1 + math.log(v)) ** 2 for v in c.values()))
                for d, c in tfs.items()}
    expected = {}
    for qid, qtext in QUERIES:
        q = Counter(t for t in qtext.split() if t in df)
        if not q:
            continue
        qw = {t: (1 + math.log(v)) * math.log(n / df[t]) for t, v in q.items()}
        qn = math.sqrt(sum(w * w for w in qw.values()))
        scores = {}
        for d, c in tfs.items():
            dot = sum((qw[t] / qn) * (1 + math.log(c[t])) for t in qw if t in c)
            if dot:
                scores[d] = dot / lnc_norm[d]
        ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))
        expected[qid] = [(i + 1, d, round(kv, 4)) for i, (d, kv) in enumerate(ranked)]
    got = tfidf_topk(tf_index, qdf, k=10, rank_round=6).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, round(r.score, 4)))
    assert by_q == expected
    # idf = ln(N/df) zeroes a term present in EVERY doc — no crash, and a
    # query made only of such terms scores 0 everywhere but still ranks
    # deterministically by doc_id


def test_search_after_equals_offset_page(spark, documents):
    """Cursor pagination must reproduce OFFSET pagination exactly (same
    ordering key), while never ranking past depth k."""
    from invertedfiles_jl_spark.sources.corpus import corpus_from_documents
    from invertedfiles_jl_spark.sources.queries import queries_df

    corpus = corpus_from_documents(documents).select("doc_id", "content")
    idx = build_index(corpus, IndexConfig(weighting="bm25", weight_dtype="double"))
    q = queries_df(spark)
    page1 = bm25_topk(idx, q, k=10, rank_round=6)
    cursor = page1.filter(F.col("rank") == 10).select(
        "query_id", F.col("score").alias("after_score"),
        F.col("doc_id").alias("after_doc_id"))
    via_cursor = search_after_topk(idx, q, cursor, k=10, rank_round=6)
    via_offset = bm25_topk(idx, q, k=10, rank_round=6, offset=10)
    a = {(r.query_id, r.rank, r.doc_id, round(r.score, 5))
         for r in via_cursor.collect()}
    b = {(r.query_id, r.rank - 10, r.doc_id, round(r.score, 5))
         for r in via_offset.collect()
         # offset-page rows exist even for queries whose page 1 was short;
         # cursor rows require a full page 1 (rank-10 row present)
         if r.query_id in {c.query_id for c in cursor.collect()}}
    assert a == b and len(a) > 0


def test_facet_top_hits_invariants(spark, documents):
    from invertedfiles_jl_spark.sources.corpus import corpus_from_documents
    from invertedfiles_jl_spark.sources.queries import queries_df

    corpus = corpus_from_documents(documents).select("doc_id", "content")
    idx = build_index(corpus, IndexConfig(weighting="bm25", weight_dtype="double"))
    rows = facet_top_hits(idx, queries_df(spark), documents,
                          facet_col="lang", k_buckets=3, k_hits=2,
                          rank_round=6).collect()
    assert rows
    seen = {}
    for r in rows:
        seen.setdefault((r.query_id, r.facet), []).append(r)
    for (qid, facet), hits in seen.items():
        assert len(hits) <= 2
        assert sorted(h.hit_rank for h in hits) == list(range(1, len(hits) + 1))
        # hits within a bucket are score-desc, doc_id-asc
        ordered = sorted(hits, key=lambda h: h.hit_rank)
        keys = [(-round(h.score, 6), h.doc_id) for h in ordered]
        assert keys == sorted(keys)
    # ≤ 3 buckets per query
    per_q = Counter(qid for qid, _ in seen)
    assert all(v <= 3 for v in per_q.values())


def test_chunk_documents_tiles_and_hashes(spark):
    texts = {
        0: " ".join(f"t{i}" for i in range(10)),   # n=10: chunks at 0,4,8
        1: "a b c",                                  # n=3 < window: 1 chunk
        2: "",                                       # zero tokens: no rows
        3: " ".join(f"x{i}" for i in range(8)),     # n=8: exact 2 windows? 0,4
    }
    corpus = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, content string")
    W, S = 6, 4
    rows = chunk_documents(corpus, window=W, stride=S).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc
    for d, chunks in by_doc.items():
        toks = texts[d].split()
        n = len(toks)
        exp_chunks = 1 + max(0, math.ceil((n - W) / S))
        chunks = sorted(chunks, key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(exp_chunks))
        for c in chunks:
            assert c.begin_tok == c.chunk_idx * S
            piece = toks[c.begin_tok:c.begin_tok + W]
            assert c.chunk_len == len(piece)
            assert c.chunk_sha256 == hashlib.sha256(
                " ".join(piece).encode()).hexdigest()
        # every token covered: union of [begin, begin+len) = [0, n)
        covered = set()
        for c in chunks:
            covered |= set(range(c.begin_tok, c.begin_tok + c.chunk_len))
        assert covered == set(range(n))
        # only the final chunk may be short
        assert all(c.chunk_len == W for c in chunks[:-1])


def test_tf_weighting_stores_raw_tf(tf_index, corpus):
    flat = (tf_index.postings.select(
        "term_id", F.explode(F.arrays_zip("doc_ids", "weights")).alias("e"))
        .select("term_id", F.col("e.doc_ids").alias("doc_id"),
                F.col("e.weights").alias("w"))
        .join(tf_index.vocab.select("term_id", "term"), "term_id"))
    got = {(r.term, r.doc_id): r.w for r in flat.collect()}
    tfs = _tfs()
    expected = {(t, d): float(v) for d, c in tfs.items() for t, v in c.items()}
    assert got == expected


def test_symbol_normalization_is_what_makes_hits(spark, documents):
    """Attribution: over the identifier-styled corpus, plain BM25 finds
    NOTHING for the word queries; the subtoken normalizer finds plenty."""
    from invertedfiles_jl_spark.functions.tokenize import symbol_normalize_sql
    from invertedfiles_jl_spark.sources.corpus import symbolized_from_documents
    from invertedfiles_jl_spark.sources.queries import queries_df

    sym = symbolized_from_documents(documents)
    cfg = IndexConfig(weighting="bm25", weight_dtype="double")
    raw_idx = build_index(sym, cfg)
    assert bm25_topk(raw_idx, queries_df(spark), k=10).count() == 0
    normed = sym.select(
        "doc_id", F.expr(symbol_normalize_sql("content")).alias("content"))
    idx = build_index(normed, cfg)
    assert bm25_topk(idx, queries_df(spark), k=10).count() > 50


def test_symbol_normalizer_cases(spark):
    from invertedfiles_jl_spark.functions.tokenize import (
        duckdb_symbol_normalize_sql,
        symbol_normalize_sql,
    )

    raw = "readFile HTTPServer my_snake_var XMLHttpRequest plainword A1bC2d"
    want = "read file http server my snake var xml http request plainword a1b c2d"
    got = (spark.createDataFrame([(raw,)], "c string")
           .selectExpr(symbol_normalize_sql("c") + " AS s").first().s)
    assert got == want
    import duckdb

    got_duck = duckdb.sql(
        "SELECT " + duckdb_symbol_normalize_sql(f"'{raw}'") + " AS s"
    ).fetchone()[0]
    assert got_duck == want


def test_federated_equals_monolithic(spark, documents):
    """Segment federation must be invisible: identical (rank, doc, score)
    to the monolithic index, for 2-way parity and 3-way uneven splits."""
    from invertedfiles_jl_spark.operators.search import federated_bm25_topk
    from invertedfiles_jl_spark.sources.queries import queries_df

    corpus = documents.select("doc_id", F.col("text").alias("content"))
    cfg = IndexConfig(weighting="tf", weight_dtype="double")
    mono_cfg = IndexConfig(weighting="bm25", weight_dtype="double")
    mono = bm25_topk(build_index(corpus, mono_cfg), queries_df(spark),
                     k=10, rank_round=6)
    want = {(r.query_id, r.rank, r.doc_id, round(r.score, 5))
            for r in mono.collect()}
    for splits in (2, 3):
        segs = [build_index(corpus.filter(F.col("doc_id") % splits == p), cfg)
                for p in range(splits)]
        got = federated_bm25_topk(segs, queries_df(spark), k=10, rank_round=6)
        have = {(r.query_id, r.rank, r.doc_id, round(r.score, 5))
                for r in got.collect()}
        assert have == want


def test_federated_single_segment_equals_plain(spark, documents):
    from invertedfiles_jl_spark.operators.search import federated_bm25_topk
    from invertedfiles_jl_spark.sources.queries import queries_df

    corpus = documents.select("doc_id", F.col("text").alias("content"))
    seg = build_index(corpus, IndexConfig(weighting="tf", weight_dtype="double"))
    mono = build_index(corpus, IndexConfig(weighting="bm25", weight_dtype="double"))
    a = {(r.query_id, r.rank, r.doc_id, round(r.score, 5)) for r in
         federated_bm25_topk([seg], queries_df(spark), k=10, rank_round=6).collect()}
    b = {(r.query_id, r.rank, r.doc_id, round(r.score, 5)) for r in
         bm25_topk(mono, queries_df(spark), k=10, rank_round=6).collect()}
    assert a == b
