"""The "code" tokenizer (identifiers | numbers | operator chars) — the
north-rule ingest path for source-code content.  JVM regex, pandas-UDF
variant, and a code-tokenized build must all agree."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from invertedfiles_jl_spark.config import IndexConfig

SNIPPETS = [
    (0, "def foo(x):\n    return x + 1  # add_one"),
    (1, "for (int i = 0; i < 10; i++) { sum += arr[i]; }"),
    (2, "SELECT * FROM t WHERE a >= 42 AND b != 'x'"),
    (3, "let v: Vec<u64> = vec![1, 2, 3];"),
    (4, "x=1"),
]

_RE = re.compile(IndexConfig.CODE_TOKEN_RE)


def _oracle_tokens(s: str) -> list[str]:
    return [t.lower() for t in _RE.findall(s)]


@pytest.fixture(scope="module")
def code_df(spark):
    return spark.createDataFrame(SNIPPETS, "doc_id long, content string")


def test_jvm_tokens_match_python_regex(spark, code_df):
    from invertedfiles_jl_spark.functions.tokenize import tokenize

    cfg = IndexConfig(tokenizer="code")
    got = {r.doc_id: list(r.tokens)
           for r in tokenize(code_df, "content", cfg).collect()}
    for doc_id, text in SNIPPETS:
        assert got[doc_id] == _oracle_tokens(text), f"doc {doc_id}"


def test_pandas_udf_tokenizer_matches_jvm(spark, code_df):
    from invertedfiles_jl_spark.functions.tokenize import code_tokens_udf, tokenize

    cfg = IndexConfig(tokenizer="code")
    jvm = {r.doc_id: list(r.tokens)
           for r in tokenize(code_df, "content", cfg).collect()}
    udf = {r.doc_id: list(r.tokens)
           for r in code_df.select("doc_id", code_tokens_udf()("content").alias("tokens")).collect()}
    assert jvm == udf


def test_code_tokenized_build_vocab(spark, code_df):
    from invertedfiles_jl_spark.operators.build import build_index

    idx = build_index(code_df, IndexConfig(tokenizer="code", weighting="binary"))
    vocab = {r.term: r.df for r in idx.vocab.collect()}
    want_df = Counter()
    for _, text in SNIPPETS:
        want_df.update(set(_oracle_tokens(text)))
    assert vocab == dict(want_df)
    # operator tokens are first-class terms
    assert vocab["+"] >= 2 and vocab["("] >= 2 and "42" in vocab


def test_code_search_on_synth_corpus(spark):
    """End-to-end on the FIXTURES F1 synthetic code corpus with the code
    tokenizer: top-k BM25 matches a Counter-based oracle."""
    import math

    from invertedfiles_jl_spark.operators.build import build_index
    from invertedfiles_jl_spark.operators.search import bm25_topk
    from invertedfiles_jl_spark.sources.synth import synth_corpus
    from tests import oracle

    corpus = synth_corpus(spark, 300).select("doc_id", "content")
    cfg = IndexConfig(tokenizer="code", weighting="bm25")
    idx = build_index(corpus, cfg)
    texts = {r.doc_id: r.content for r in corpus.collect()}

    def tok(s):
        return _oracle_tokens(s)

    # recompute the python oracle under the code tokenizer
    old = oracle.tokenize_ws
    oracle.tokenize_ws = tok
    try:
        q = "tk1 tk17 tk403"
        gold = oracle.topk_of(oracle.bm25_scores(texts, q), 10, ascending=False)
    finally:
        oracle.tokenize_ws = old
    qdf = spark.createDataFrame([(1, q)], "query_id long, content string")
    got = [(r.doc_id, r.score) for r in
           sorted(bm25_topk(idx, qdf, k=10).collect(), key=lambda r: r.rank)]
    assert [d for d, _ in got] == [d for d, _ in gold]
    for (_, s), (_, gs) in zip(got, gold):
        assert math.isclose(s, gs, rel_tol=1e-5, abs_tol=1e-5)
