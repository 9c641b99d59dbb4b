"""Codec roundtrip — FIXTURES.md F5: lengths {1, 2, 127, 128, 10_000},
doc_ids up to 2^40, plus hypothesis property roundtrip."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from invertedfiles_jl_spark.operators.codec import (
    decode_posting,
    encode_posting,
    vb_decode,
    vb_encode,
)

rng = np.random.default_rng(42)


@pytest.mark.parametrize("n", [1, 2, 127, 128, 10_000])
def test_roundtrip_sizes(n):
    ids = np.sort(rng.choice(np.uint64(1) << np.uint64(40), size=n, replace=False))
    out = decode_posting(encode_posting(ids))
    np.testing.assert_array_equal(out, ids)


def test_empty():
    assert decode_posting(b"").size == 0
    assert vb_encode(np.empty(0, dtype=np.uint64)) == b""


def test_compression_ratio_dense():
    # dense ids → small gaps → ~1 byte each vs 8 raw
    ids = np.arange(0, 100_000, 3, dtype=np.uint64)
    buf = encode_posting(ids)
    assert len(buf) < 1.2 * len(ids)


@given(st.lists(st.integers(min_value=0, max_value=(1 << 62) - 1), min_size=0, max_size=300))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    np.testing.assert_array_equal(vb_decode(vb_encode(arr)), arr)


@given(st.sets(st.integers(min_value=0, max_value=(1 << 40) - 1), min_size=1, max_size=200))
@settings(max_examples=200, deadline=None)
def test_posting_roundtrip_property(idset):
    ids = np.array(sorted(idset), dtype=np.uint64)
    np.testing.assert_array_equal(decode_posting(encode_posting(ids)), ids)


@given(st.lists(st.sets(st.integers(min_value=0, max_value=(1 << 40) - 1),
                        min_size=0, max_size=50),
                min_size=0, max_size=30))
@settings(max_examples=100, deadline=None)
def test_batch_roundtrip_matches_per_list(idsets):
    """Batch-wide encode/decode ≡ per-list encode/decode, including empty
    lists at any position in the batch."""
    from invertedfiles_jl_spark.operators.codec import (
        decode_postings_batch,
        encode_postings_batch,
    )

    lists = [np.array(sorted(s), dtype=np.uint64) for s in idsets]
    bufs = encode_postings_batch(lists)
    assert bufs == [encode_posting(a) for a in lists]
    back = decode_postings_batch(bufs)
    assert len(back) == len(lists)
    for got, want in zip(back, lists):
        np.testing.assert_array_equal(got, want)


def test_batch_many_short_tail_lists():
    """The 100-TB shape the batch path exists for: millions of tiny lists —
    here 50k singletons round-trip through ONE numpy pass."""
    from invertedfiles_jl_spark.operators.codec import (
        decode_postings_batch,
        encode_postings_batch,
    )

    lists = [np.array([i * 37], dtype=np.uint64) for i in range(50_000)]
    back = decode_postings_batch(encode_postings_batch(lists))
    for got, want in zip(back, lists):
        np.testing.assert_array_equal(got, want)


def test_dataframe_wrappers(spark):
    from invertedfiles_jl_spark.operators.codec import compress_postings, decompress_postings

    df = spark.createDataFrame(
        [(1, [1, 5, 9, 1000]), (2, [7]), (3, list(range(0, 3000, 7)))],
        "term_id long, doc_ids array<long>",
    )
    back = decompress_postings(compress_postings(df))
    got = {r["term_id"]: list(r["doc_ids"]) for r in back.collect()}
    assert got == {1: [1, 5, 9, 1000], 2: [7], 3: list(range(0, 3000, 7))}
