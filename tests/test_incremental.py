"""Incremental append (push_item! analog): append(half2, build(half1)) must
equal build(full) for append-invariant weightings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.build import build_index
from invertedfiles_jl_spark.operators.search import bm25_topk, set_distance_topk
from invertedfiles_jl_spark.sources.queries import queries_df
from invertedfiles_jl_spark.streaming.incremental import append_documents


@pytest.fixture(scope="module")
def halves(documents):
    base = documents.select("doc_id", F.col("text").alias("content"))
    return base.filter(F.col("doc_id") < 250), base.filter(F.col("doc_id") >= 250), base


def _postings_content(idx):
    rows = idx.postings.select("term_id", "salt", "doc_ids", "weights").collect()
    merged = {}
    for r in rows:  # merge salt parts per term for comparison
        merged.setdefault(r["term_id"], []).extend(zip(r["doc_ids"], r["weights"]))
    return {t: sorted(v) for t, v in merged.items()}


@pytest.mark.parametrize("weighting", ["normcosine", "binary"])
def test_append_equals_full_build(halves, weighting):
    h1, h2, full = halves
    cfg = IndexConfig(weighting=weighting)
    idx = append_documents(build_index(h1, cfg), h2)
    ref = build_index(full, cfg)
    assert idx.stats["n_docs"] == ref.stats["n_docs"]
    assert _postings_content(idx) == _postings_content(ref)
    va = {r["term"]: (r["df"], r["cf"]) for r in idx.vocab.collect()}
    vb = {r["term"]: (r["df"], r["cf"]) for r in ref.vocab.collect()}
    assert va == vb


def test_append_bm25_queryable(halves, spark):
    """BM25 stored weights keep the original avgdl (documented); results
    must still be sane and cover appended docs."""
    h1, h2, full = halves
    cfg = IndexConfig(weighting="bm25")
    idx = append_documents(build_index(h1, cfg), h2)
    res = bm25_topk(idx, queries_df(spark), k=10).collect()
    assert res
    docs_hit = {r["doc_id"] for r in res}
    assert any(d >= 250 for d in docs_hit), "appended docs never retrieved"


def test_binary_append_rank_identical(halves, spark):
    h1, h2, full = halves
    cfg = IndexConfig(weighting="binary")
    inc = append_documents(build_index(h1, cfg), h2)
    ref = build_index(full, cfg)
    a = {(r["query_id"], r["rank"]): r["doc_id"]
         for r in set_distance_topk(inc, queries_df(spark), 10, "jaccard").collect()}
    b = {(r["query_id"], r["rank"]): r["doc_id"]
         for r in set_distance_topk(ref, queries_df(spark), 10, "jaccard").collect()}
    assert a == b


def test_append_compressed_resalts_correctly(halves, spark):
    """Append on a COMPRESSED index: merged lists must be re-salted against
    the merged doc range (doc-range-disjoint sub-lists), re-encoded, and
    decode to exactly the full-rebuild postings."""
    from invertedfiles_jl_spark.operators.codec import decode_posting

    h1, h2, full = halves
    # low salt threshold so hot terms actually salt in this corpus
    cfg = IndexConfig(weighting="binary", compress=True, salt_df_threshold=50,
                      salt_buckets=4)
    idx = append_documents(build_index(h1, cfg), h2)
    ref = build_index(full, cfg)

    def content(ix):
        merged: dict = {}
        ranges: dict = {}
        for r in ix.postings.collect():
            ids = decode_posting(bytes(r["ids_vb"])).tolist()
            merged.setdefault(r["term_id"], []).extend(ids)
            ranges.setdefault(r["term_id"], []).append((r["salt"], min(ids), max(ids)))
        return merged, ranges

    got, got_ranges = content(idx)
    want, _ = content(ref)
    assert {t: sorted(v) for t, v in got.items()} == {t: sorted(v) for t, v in want.items()}
    # salt invariant: within a term, sub-list doc ranges are disjoint and
    # ordered by salt — concatenation in salt order is globally doc-sorted
    for t, parts in got_ranges.items():
        parts.sort()
        for (s0, _, hi0), (s1, lo1, _) in zip(parts, parts[1:]):
            assert hi0 < lo1, f"term {t}: salt {s0} range overlaps salt {s1}"


def test_append_positional_equals_rebuild(spark, documents):
    """Appending docs to the positional table == rebuilding it over the
    combined corpus (rows are doc-keyed; union is exact)."""
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.operators.positional import positional_postings
    from invertedfiles_jl_spark.streaming.incremental import append_positional

    corpus = documents.select("doc_id", F.col("text").alias("content"))
    old_c = corpus.filter("doc_id % 5 != 0")
    new_c = corpus.filter("doc_id % 5 = 0")
    appended = append_positional(positional_postings(old_c), new_c)
    rebuilt = positional_postings(corpus)
    cols = ["term_id", "doc_id", "positions", "tf"]
    a = sorted(map(tuple, appended.select(*cols).collect()))
    b = sorted(map(tuple, rebuilt.select(*cols).collect()))
    assert a == b and len(a) > 0
