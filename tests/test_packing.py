"""Sequence packing — python mirror + structural invariants (shards tile
exactly, spans partition each doc, straddles handled, empty docs skipped)."""

from __future__ import annotations

import pytest

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.packing import (
    global_starts,
    pack_sequences,
    token_counts,
)


@pytest.fixture(scope="module")
def corpus(documents):
    from pyspark.sql import functions as F

    return documents.select("doc_id", F.col("text").alias("content"))


def _py_manifest(lengths: dict[int, int], ctx: int):
    """Pure-python concat-and-cut mirror."""
    out, start = [], 0
    for d in sorted(lengths):
        n = lengths[d]
        if n <= 0:
            continue
        first, last = start // ctx, (start + n - 1) // ctx
        for sh in range(first, last + 1):
            out.append((sh, d,
                        max(0, sh * ctx - start),
                        min(n, (sh + 1) * ctx - start),
                        max(0, start - sh * ctx)))
        start += n
    return sorted(out)


def test_pack_matches_python(corpus, docs_pandas, spark):
    ctx = 128
    lengths = {r.doc_id: len(r.text.lower().split())
               for r in docs_pandas.itertuples()}
    got = sorted(tuple(r) for r in pack_sequences(corpus, ctx).collect())
    assert got == _py_manifest(lengths, ctx)


def test_pack_invariants(corpus, spark):
    """Every shard except the last carries exactly ctx tokens, tiled
    contiguously; every doc's spans partition [0, n_tokens)."""
    ctx = 100
    rows = pack_sequences(corpus, ctx).collect()
    assert rows
    by_shard: dict = {}
    by_doc: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(
            (r["offset_in_shard"], r["end_tok"] - r["begin_tok"]))
        by_doc.setdefault(r["doc_id"], []).append(
            (r["begin_tok"], r["end_tok"]))
    last = max(by_shard)
    for sh, spans in by_shard.items():
        spans.sort()
        pos = 0
        for off, ln in spans:
            assert off == pos, (sh, off, pos)
            assert ln > 0
            pos = off + ln
        if sh != last:
            assert pos == ctx, f"shard {sh} carries {pos} != {ctx}"
        else:
            assert 0 < pos <= ctx
    for d, spans in by_doc.items():
        spans.sort()
        assert spans[0][0] == 0
        for (b1, e1), (b2, e2) in zip(spans, spans[1:]):
            assert e1 == b2, (d, spans)
    # total span length == total token count from an independent source
    counts = {r["doc_id"]: r["n_tokens"]
              for r in token_counts(corpus, IndexConfig()).collect()}
    for d, spans in by_doc.items():
        assert spans[-1][1] == counts[d], d
    assert sum(e - b for spans in by_doc.values() for b, e in spans) \
        == sum(n for n in counts.values() if n > 0)


def test_pack_straddle_and_empty(spark):
    """Hand corpus: an empty doc emits nothing; a doc longer than ctx spans
    ceil(n/ctx)+ straddle shards with correct in-doc offsets."""
    rows = [
        (1, "a b c"),            # 3 tokens
        (2, ""),                 # empty → no rows
        (3, " ".join(["t"] * 10)),  # 10 tokens, straddles ctx=4 shards
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, content string")
    got = sorted(tuple(r) for r in pack_sequences(corpus, ctx=4).collect())
    # concat order: doc1 [0,3), doc3 [3,13); cuts at 4, 8, 12
    assert got == [
        (0, 1, 0, 3, 0),   # doc1 fills shard0 [0,3)
        (0, 3, 0, 1, 3),   # doc3 token 0 finishes shard0
        (1, 3, 1, 5, 0),   # tokens 1..4 fill shard1
        (2, 3, 5, 9, 0),   # tokens 5..8 fill shard2
        (3, 3, 9, 10, 0),  # token 9 starts shard3 (partial last shard)
    ]
    assert all(r[1] != 2 for r in got)


def test_global_starts_order_independent_of_partitioning(corpus, spark):
    """The two-level scan must equal the naive global cumsum whatever the
    range count."""
    cfg = IndexConfig()
    counts = token_counts(corpus, cfg)
    a = {r["doc_id"]: r["start"]
         for r in global_starts(counts, num_ranges=2).collect()}
    b = {r["doc_id"]: r["start"]
         for r in global_starts(counts, num_ranges=17).collect()}
    assert a == b
    pd = sorted((d, s) for d, s in a.items())
    acc = 0
    lens = {r["doc_id"]: r["n_tokens"] for r in counts.collect()}
    for d, s in pd:
        assert s == acc, d
        acc += lens[d]
