"""Pagination, faceted counts, more-like-this, and benchmark contamination
— each checked against a pure-python recomputation from the raw texts."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.build import build_index
from invertedfiles_jl_spark.operators.dedup import benchmark_contamination
from invertedfiles_jl_spark.operators.search import (
    bm25_topk,
    facet_counts,
    more_like_this,
)
from invertedfiles_jl_spark.sources.queries import QUERY_SET, queries_df

from tests import oracle


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


def _rows(df):
    return [tuple(r) for r in df.collect()]


# ---------------------------------------------------------------------------
# pagination
# ---------------------------------------------------------------------------


def test_pagination_is_a_slice_of_the_full_ranking(bm25_index, spark):
    """Page 2 must be EXACTLY ranks 11..20 of the single-window ranking —
    same scores, same global rank numbers (search_after consistency)."""
    q = queries_df(spark)
    full = {(r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
            for r in bm25_topk(bm25_index, q, k=20, rank_round=6).collect()}
    page2 = bm25_topk(bm25_index, q, k=10, rank_round=6, offset=10).collect()
    assert page2, "fixture must have queries with > 10 hits"
    for r in page2:
        assert 10 < r["rank"] <= 20
        assert full[(r["query_id"], r["rank"])] == (
            r["doc_id"], round(r["score"], 9))
    # no page-2 row may duplicate a page-1 doc
    page1_docs = {(q_, d) for (q_, rk), (d, _) in full.items() if rk <= 10}
    assert all((r["query_id"], r["doc_id"]) not in page1_docs for r in page2)


def test_pagination_offset_zero_is_identity(bm25_index, spark):
    q = queries_df(spark)
    a = _rows(bm25_topk(bm25_index, q, k=5, rank_round=6))
    b = _rows(bm25_topk(bm25_index, q, k=5, rank_round=6, offset=0))
    assert sorted(a) == sorted(b)


# ---------------------------------------------------------------------------
# facets
# ---------------------------------------------------------------------------


def test_facet_counts_match_python(bm25_index, documents, texts, spark):
    meta = {r["doc_id"]: r["lang"] for r in
            documents.select("doc_id", "lang").collect()}
    got = {}
    for r in facet_counts(bm25_index, queries_df(spark), documents,
                          facet_col="lang", k=3).collect():
        got.setdefault(r["query_id"], []).append(
            (r["facet_rank"], r["facet"], r["n_docs"]))
    for qid, qtext in QUERY_SET:
        qterms = set(oracle.tokenize_ws(qtext))
        cand = {d for d, t in texts.items()
                if qterms & set(oracle.tokenize_ws(t))}
        counts = Counter(meta[d] for d in cand)
        want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        want = [(i + 1, f, c) for i, (f, c) in enumerate(want)]
        assert sorted(got.get(qid, [])) == want, f"query {qid}"


# ---------------------------------------------------------------------------
# more-like-this
# ---------------------------------------------------------------------------


def _mlt_oracle(texts, src_ids, n_terms, k, k1=1.2, b=0.75):
    tfs, df, n, avgdl = oracle.build_corpus_stats(texts)
    out = {}
    for s in src_ids:
        prof = []
        for term, tf in tfs[s].items():
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            prof.append((-round(tf * idf, 6), term, idf))
        prof.sort()
        chosen = [(term, idf) for _, term, idf in prof[:n_terms]]
        scores = {}
        for d, c in tfs.items():
            if d == s:
                continue
            dl = sum(c.values())
            sc = 0.0
            hit = False
            for term, idf in chosen:
                tf = c.get(term, 0)
                if tf == 0:
                    continue
                hit = True
                sat = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
                sc += idf * sat
            if hit:
                scores[d] = sc
        out[s] = [(i + 1, d, round(sc, 5)) for i, (d, sc) in
                  enumerate(sorted(scores.items(),
                                   key=lambda kv: (-round(kv[1], 6), kv[0]))[:k])]
    return out


def test_more_like_this_matches_python(bm25_index, corpus, texts, spark):
    src_ids = sorted(texts)[:7]
    src = spark.createDataFrame([(d,) for d in src_ids], "doc_id long")
    got = {}
    for r in more_like_this(bm25_index, corpus, src, k=5, n_terms=4,
                            rank_round=6).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 5)))
    want = _mlt_oracle(texts, src_ids, n_terms=4, k=5)
    for s in src_ids:
        assert sorted(got.get(s, [])) == want[s], f"source {s}"


def test_more_like_this_excludes_source(bm25_index, corpus, texts, spark):
    src_ids = sorted(texts)[:20]
    src = spark.createDataFrame([(d,) for d in src_ids], "doc_id long")
    for r in more_like_this(bm25_index, corpus, src, k=10,
                            rank_round=6).collect():
        assert r["doc_id"] != r["query_id"]


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def _shingles(text, n=3):
    toks = oracle.tokenize_ws(text)
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_contamination_matches_python(corpus, texts, spark):
    bench_ids = {d for d in texts if d % 7 == 0}
    bench_sh = set().union(*(_shingles(texts[d]) for d in bench_ids)) \
        if bench_ids else set()
    train = corpus.filter("doc_id % 7 != 0")
    bench = corpus.filter("doc_id % 7 = 0")
    got = {r["doc_id"]: (r["n_shingles"], r["n_hit"], r["rate"])
           for r in benchmark_contamination(train, bench).collect()}
    for d, t in texts.items():
        if d in bench_ids:
            assert d not in got
            continue
        sh = _shingles(t)
        hit = len(sh & bench_sh)
        assert got[d] == (len(sh), hit, round(hit / len(sh), 6)), f"doc {d}"


def test_contamination_self_is_total(corpus, spark):
    """A doc checked against a benchmark containing itself is 100% hit."""
    sub = corpus.limit(5)
    for r in benchmark_contamination(sub, sub).collect():
        assert r["n_hit"] == r["n_shingles"] and r["rate"] == 1.0


# ---------------------------------------------------------------------------
# did-you-mean / co-occurrence
# ---------------------------------------------------------------------------


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_suggest_corrections_match_python(bm25_index, texts, spark):
    from collections import Counter

    from invertedfiles_jl_spark.operators.search import suggest_corrections
    from invertedfiles_jl_spark.sources.queries import FUZZY_SET, fuzzy_df

    cf = Counter()
    for t in texts.values():
        cf.update(oracle.tokenize_ws(t))
    got = {}
    for r in suggest_corrections(bm25_index, fuzzy_df(spark), k=3,
                                 max_dist=2).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["term"], r["dist"], r["cf"]))
    for qid, qterm in FUZZY_SET:
        cands = [(d, -cf[t], t) for t in cf
                 if (d := _levenshtein(t, qterm)) <= 2]
        cands.sort()
        want = [(i + 1, t, d, -negcf) for i, (d, negcf, t) in
                enumerate(cands[:3])]
        assert sorted(got.get(qid, [])) == want, f"query {qid}"


def test_suggest_corrections_exact_term_ranks_first(bm25_index, spark):
    from invertedfiles_jl_spark.operators.search import suggest_corrections

    q = spark.createDataFrame([(1, "merge")], "query_id long, qterm string")
    rows = suggest_corrections(bm25_index, q, k=3).collect()
    top = [r for r in rows if r["rank"] == 1][0]
    assert top["term"] == "merge" and top["dist"] == 0


def test_term_cooccurrence_matches_python(corpus, texts, spark):
    import math
    from collections import Counter
    from itertools import combinations

    from invertedfiles_jl_spark.operators.meta import term_cooccurrence

    n = len(texts)
    df = Counter()
    pair_df = Counter()
    for t in texts.values():
        toks = sorted(set(oracle.tokenize_ws(t)))
        df.update(toks)
        pair_df.update(combinations(toks, 2))
    scored = [
        (-round(math.log(n * c / (df[a] * df[b])), 6), a, b, c,
         round(math.log(n * c / (df[a] * df[b])), 6))
        for (a, b), c in pair_df.items() if c >= 2
    ]
    scored.sort()
    want = [(i + 1, a, b, c, pmi) for i, (_, a, b, c, pmi) in
            enumerate(scored[:10])]
    got = sorted(
        tuple(r) for r in
        term_cooccurrence(corpus, k=10, min_pair_df=2).collect())
    assert got == want


def test_term_cooccurrence_doc_term_cap(corpus, texts, spark):
    """With max_doc_terms=1 only each doc's single top-tf term survives —
    no pairs can form, so the result is empty (the cap is a real gate)."""
    from invertedfiles_jl_spark.operators.meta import term_cooccurrence

    assert term_cooccurrence(corpus, k=5, max_doc_terms=1).count() == 0


# ---------------------------------------------------------------------------
# boosted (function-score) retrieval
# ---------------------------------------------------------------------------


def test_boosted_neutral_is_identity(bm25_index, spark):
    """All-ones boosts reproduce bm25_topk exactly; docs missing from the
    boost relation default to neutral."""
    from invertedfiles_jl_spark.operators.search import boosted_bm25_topk

    q = queries_df(spark)
    want = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in bm25_topk(bm25_index, q, k=10, rank_round=6).collect()]
    empty = spark.createDataFrame([], "doc_id long, boost double")
    got = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
           for r in boosted_bm25_topk(bm25_index, q, empty, k=10,
                                      rank_round=6).collect()]
    assert sorted(got) == sorted(want)


def test_boosted_matches_python(bm25_index, texts, spark):
    """score' = bm25 score × (1 + (doc_id % 5)·0.05), re-ranked."""
    import math
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.operators.search import boosted_bm25_topk

    q = queries_df(spark)
    base = {}
    for r in bm25_topk(bm25_index, q, k=10_000, rank_round=6).collect():
        base.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    boosts = bm25_index.docs.select(
        "doc_id", F.expr("1.0 + (doc_id % 5) * 0.05").alias("boost"))
    got = {}
    for r in boosted_bm25_topk(bm25_index, q, boosts, k=10,
                               rank_round=6).collect():
        got[(r["query_id"], r["rank"])] = (r["doc_id"], r["score"])
    for qid, docs in base.items():
        want = sorted(((d, s * (1.0 + (d % 5) * 0.05)) for d, s in docs.items()),
                      key=lambda kv: (-round(kv[1], 6), kv[0]))[:10]
        for rank, (d, s) in enumerate(want, start=1):
            gd, gs = got[(qid, rank)]
            assert gd == d, (qid, rank)
            assert math.isclose(gs, s, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# significant terms
# ---------------------------------------------------------------------------


def test_significant_terms_match_python(documents, docs_pandas, spark):
    import math
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.operators.meta import significant_terms

    docs = documents.select("doc_id", "lang", F.col("text").alias("content"))
    got = {(r["stratum"], r["rank"]): (r["term"], r["fg"], r["bg"],
                                       r["jlh"])
           for r in significant_terms(docs, "lang", n=5, min_fg=3).collect()}
    # python mirror
    langs = dict(zip(docs_pandas["doc_id"], docs_pandas["lang"]))
    terms = {d: set(t.lower().split())
             for d, t in zip(docs_pandas["doc_id"], docs_pandas["text"])}
    n = len(terms)
    strata: dict = {}
    for d, l in langs.items():
        strata.setdefault(l, set()).add(d)
    bg = Counter(t for ts in terms.values() for t in ts)
    for lang, members in strata.items():
        fg = Counter(t for d in members for t in terms[d])
        cand = []
        for t, f in fg.items():
            if f < 3:
                continue
            fg_pct = f / len(members)
            bg_pct = bg[t] / n
            if fg_pct > bg_pct:
                cand.append((t, f, bg[t],
                             (fg_pct - bg_pct) * (fg_pct / bg_pct)))
        cand.sort(key=lambda x: (-round(x[3], 6), x[0]))
        for rank, (t, f, b_, j) in enumerate(cand[:5], start=1):
            gt, gf, gb, gj = got[(lang, rank)]
            assert (gt, gf, gb) == (t, f, b_), (lang, rank)
            assert math.isclose(gj, round(j, 6), abs_tol=2e-6)


# ---------------------------------------------------------------------------
# synonym expansion
# ---------------------------------------------------------------------------


def test_synonym_empty_thesaurus_is_identity(bm25_index, spark):
    """With no synonym rows, expansion must reproduce bm25_topk exactly
    (qw = qtf cast to double, same scoring chain)."""
    from invertedfiles_jl_spark.operators.search import synonym_bm25_topk

    q = queries_df(spark)
    want = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in bm25_topk(bm25_index, q, k=10, rank_round=6).collect()]
    empty = spark.createDataFrame([], "term string, syn string, weight double")
    got = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
           for r in synonym_bm25_topk(bm25_index, q, empty, k=10,
                                      rank_round=6).collect()]
    assert sorted(got) == sorted(want)


def test_synonym_matches_python(bm25_index, texts, spark):
    """Full expansion semantics recomputed in pure python: qw accumulates
    direct qtf plus qtf·weight through every thesaurus edge, then the
    standard BM25 sum."""
    from invertedfiles_jl_spark.operators.search import synonym_bm25_topk
    from invertedfiles_jl_spark.sources.queries import SYNONYM_SET, synonyms_df

    got = synonym_bm25_topk(bm25_index, queries_df(spark),
                            synonyms_df(spark), k=10, rank_round=6).collect()

    tf = {d: Counter(t.lower().split()) for d, t in texts.items()}
    df = Counter(t for c in tf.values() for t in c)
    n = len(tf)
    avgdl = sum(sum(c.values()) for c in tf.values()) / n
    edges = {}
    for t, s, w in SYNONYM_SET:
        edges.setdefault(t, []).append((s, w))
    for qid, qtext in QUERY_SET:
        qtf = Counter(qtext.split())
        qw: dict = {}
        for t, c in qtf.items():
            qw[t] = qw.get(t, 0.0) + float(c)
            for s, w in edges.get(t, []):
                qw[s] = qw.get(s, 0.0) + c * w
        scores = {}
        for d, c in tf.items():
            s = 0.0
            dl = sum(c.values())
            for t, weight in qw.items():
                if t in c:
                    idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                    sat = c[t] * 2.2 / (c[t] + 1.2 * (0.25 + 0.75 * dl / avgdl))
                    s += round(weight, 9) * idf * sat
            if s > 0.0:
                scores[d] = s
        want = sorted(scores.items(),
                      key=lambda kv: (-round(kv[1], 6), kv[0]))[:10]
        mine = [(r["doc_id"], r["score"])
                for r in sorted(got, key=lambda r: r["rank"])
                if r["query_id"] == qid]
        assert [d for d, _ in want] == [d for d, _ in mine]
        for (d, ws), (_, gs) in zip(want, mine):
            assert gs == pytest.approx(ws, abs=1e-9)


def test_synonym_reaches_docs_plain_bm25_misses(bm25_index, texts, spark):
    """A query matching only via expansion must retrieve docs that contain
    the synonym but NOT the original term ("window" → "table", weight 1)."""
    from invertedfiles_jl_spark.operators.search import synonym_bm25_topk
    from invertedfiles_jl_spark.sources.queries import synonyms_df

    q = spark.createDataFrame([(1, "window")], "query_id long, content string")
    got = synonym_bm25_topk(bm25_index, q, synonyms_df(spark), k=10_000,
                            rank_round=6).collect()
    docs = {r["doc_id"] for r in got}
    only_table = [d for d, t in texts.items()
                  if "table" in t.lower().split() and "window" not in t.lower().split()]
    assert only_table, "fixture needs table-only docs"
    assert set(only_table) <= docs


# ---------------------------------------------------------------------------
# field collapsing
# ---------------------------------------------------------------------------


def test_collapse_one_doc_per_group(bm25_index, documents, spark):
    from invertedfiles_jl_spark.operators.search import collapse_topk

    meta = documents.select("doc_id", "source")
    got = collapse_topk(bm25_index, queries_df(spark), meta, "source",
                        k=100, rank_round=6).collect()
    seen = set()
    for r in got:
        key = (r["query_id"], r["group_key"])
        assert key not in seen, "two docs from one group in one query"
        seen.add(key)


def test_collapse_keeps_each_groups_best(bm25_index, documents, texts, spark):
    """The collapsed representative must be the group's best-ranked doc of
    the UNCOLLAPSED ranking, and collapsed ranks must preserve that order."""
    from invertedfiles_jl_spark.operators.search import collapse_topk

    src = {r["doc_id"]: r["source"]
           for r in documents.select("doc_id", "source").collect()}
    full = bm25_topk(bm25_index, queries_df(spark), k=10_000,
                     rank_round=6).collect()
    best: dict = {}
    for r in sorted(full, key=lambda r: (r["query_id"], r["rank"])):
        key = (r["query_id"], src[r["doc_id"]])
        best.setdefault(key, r["doc_id"])
    meta = documents.select("doc_id", "source")
    got = collapse_topk(bm25_index, queries_df(spark), meta, "source",
                        k=10_000, rank_round=6).collect()
    assert len(got) == len(best)
    for r in got:
        assert best[(r["query_id"], r["group_key"])] == r["doc_id"]


# ---------------------------------------------------------------------------
# numeric histogram facet
# ---------------------------------------------------------------------------


def test_facet_histogram_matches_python(bm25_index, documents, texts, spark):
    from invertedfiles_jl_spark.operators.search import facet_histogram

    n_chars = {r["doc_id"]: r["n_chars"] for r in
               documents.select("doc_id", "n_chars").collect()}
    got = {}
    meta = documents.select("doc_id", "n_chars")
    for r in facet_histogram(bm25_index, queries_df(spark), meta,
                             "n_chars", width=200).collect():
        got[(r["query_id"], r["bucket_lo"])] = r["n_docs"]
    want = Counter()
    for qid, qtext in QUERY_SET:
        qterms = set(qtext.lower().split())
        for d, t in texts.items():
            if qterms & set(t.lower().split()):
                want[(qid, (n_chars[d] // 200) * 200)] += 1
    assert got == dict(want)


# ---------------------------------------------------------------------------
# per-query significant terms (significant_text)
# ---------------------------------------------------------------------------


def test_query_significant_terms_match_python(bm25_index, texts, spark):
    from invertedfiles_jl_spark.operators.search import (
        bm25_topk,
        query_significant_terms,
    )

    depth, n, min_fg = 20, 5, 2
    hits = {}
    for r in bm25_topk(bm25_index, queries_df(spark), k=depth,
                       rank_round=6).collect():
        hits.setdefault(r["query_id"], []).append(r["doc_id"])
    tf = {d: set(t.lower().split()) for d, t in texts.items()}
    df = Counter(t for s in tf.values() for t in s)
    n_docs = len(tf)
    want = {}
    for qid, docs in hits.items():
        fg = Counter(t for d in docs for t in tf[d])
        n_fg = len(docs)
        rows = []
        for t, f in fg.items():
            if f < min_fg:
                continue
            fg_pct = f / n_fg
            bg_pct = df[t] / float(n_docs)
            if fg_pct > bg_pct:
                rows.append((-round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6),
                             t, f, df[t],
                             (fg_pct - bg_pct) * (fg_pct / bg_pct)))
        rows.sort()
        want[qid] = [(i + 1, t, f, b, j) for i, (_, t, f, b, j)
                     in enumerate(rows[:n])]
    got = {}
    for r in query_significant_terms(bm25_index, corpus_df(spark, texts),
                                     queries_df(spark), n=n, depth=depth,
                                     min_fg=min_fg).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["term"], r["fg"], r["bg"], r["jlh"]))
    for qid, rows in want.items():
        mine = sorted(got.get(qid, []))
        assert [(rk, t, f, b) for rk, t, f, b, _ in rows] == \
               [(rk, t, f, b) for rk, t, f, b, _ in mine], f"query {qid}"
        for (_, _, _, _, wj), (_, _, _, _, gj) in zip(rows, mine):
            assert gj == pytest.approx(wj, abs=1e-9)


def corpus_df(spark, texts):
    return spark.createDataFrame(sorted(texts.items()),
                                 "doc_id long, content string")
