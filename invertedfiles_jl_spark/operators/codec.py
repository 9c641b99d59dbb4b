"""Delta-gap + varbyte posting-list compression (numpy-vectorized).

The reference stores plain uncompressed in-memory arrays
(/root/reference/README.md:49 — "plain in-memory structures without any kind
of compression"); compression is a north-rule capability upgrade.  Encoding
is the classic varbyte: doc-sorted ids → first-order deltas → 7-bit groups,
high bit set on the LAST byte of each value.  Both directions are pure numpy
(no per-element Python loops beyond the ≤10-iteration byte-position loop),
so they run Arrow-batched inside pandas UDFs at full vector speed.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf resolves
# signature type hints at definition time and string-ified hints break it.
import numpy as np

_THRESHOLDS = np.array([1 << (7 * i) for i in range(1, 10)], dtype=np.uint64)


def delta_encode(doc_ids: np.ndarray) -> np.ndarray:
    """Sorted non-negative ids → gaps (first id kept as-is)."""
    a = np.asarray(doc_ids, dtype=np.uint64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.uint64), dtype=np.uint64)


def vb_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a uint64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = 1 + np.searchsorted(_THRESHOLDS, v, side="right")
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    # write least-significant 7-bit group at the value's first byte, etc.
    starts = ends - nbytes
    rem = v.copy()
    max_b = int(nbytes.max())
    for i in range(max_b):
        mask = nbytes > i
        pos = starts[mask] + i
        out[pos] = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        rem = rem >> np.uint64(7)
    # set high bit on each value's last byte
    out[ends - 1] |= 0x80
    return out.tobytes()


def vb_decode(buf: bytes) -> np.ndarray:
    """Vectorized varbyte decode → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) != 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    nbytes = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    payload = (b & np.uint8(0x7F)).astype(np.uint64)
    max_b = int(nbytes.max())
    for i in range(max_b):
        mask = nbytes > i
        vals[mask] |= payload[starts[mask] + i] << np.uint64(7 * i)
    return vals


def encode_posting(doc_ids) -> bytes:
    """Sorted doc_ids → delta-gap varbyte bytes."""
    return vb_encode(delta_encode(np.asarray(doc_ids, dtype=np.uint64)))


def decode_posting(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_posting` (returns uint64 doc_ids)."""
    return delta_decode(vb_decode(buf))


# ---------------------------------------------------------------------------
# DataFrame-level wrappers
# ---------------------------------------------------------------------------


def compress_postings(postings):
    """postings(doc_ids: array<long>, ...) → ids_vb: binary replacing the
    array column.  Arrow-batched; numpy per batch."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _enc(ids: pd.Series) -> pd.Series:
        return ids.map(lambda a: encode_posting(np.asarray(a, dtype=np.int64)))

    return postings.withColumn("ids_vb", _enc("doc_ids")).drop("doc_ids")


def decompress_postings(postings):
    """Inverse: ids_vb binary → doc_ids array<long>."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _dec(bufs: pd.Series) -> pd.Series:
        return bufs.map(lambda b: decode_posting(bytes(b)).astype(np.int64))

    return postings.withColumn("doc_ids", _dec("ids_vb")).drop("ids_vb")
