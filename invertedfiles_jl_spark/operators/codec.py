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
# batch-wide vectorization: one numpy pass per Arrow batch, not per list.
# An index with millions of SHORT tail lists would otherwise pay a Python
# round-trip per list; here the batch's lists are concatenated, transformed
# once, and split back by offsets.
# ---------------------------------------------------------------------------


def encode_postings_batch(lists) -> list:
    """Iterable of sorted doc_id arrays → list of delta-gap varbyte bytes.

    Whole-batch pipeline: concat all ids → first-order diffs with the first
    element of each list restored to its absolute value → varbyte-encode the
    full gap vector once → slice the byte buffer at per-list boundaries.
    """
    arrs = [np.asarray(a, dtype=np.uint64) for a in lists]
    if not arrs:
        return []
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
    flat = np.concatenate(arrs) if lens.sum() else np.empty(0, np.uint64)
    if flat.size == 0:
        return [b""] * len(arrs)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    gaps = np.empty_like(flat)
    gaps[1:] = flat[1:] - flat[:-1]
    gaps[0] = flat[0]
    nz = starts[lens > 0]
    gaps[nz] = flat[nz]  # each list's first id stays absolute
    # varbyte encode the whole gap vector in one pass
    nbytes = 1 + np.searchsorted(_THRESHOLDS, gaps, side="right")
    ends = np.cumsum(nbytes)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    vstarts = ends - nbytes
    rem = gaps.copy()
    for i in range(int(nbytes.max())):
        mask = nbytes > i
        out[vstarts[mask] + i] = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        rem = rem >> np.uint64(7)
    out[ends - 1] |= 0x80
    buf = out.tobytes()
    # per-list byte extents: bytes of values [starts[i], starts[i]+lens[i])
    val_ends = np.cumsum(lens)
    byte_ends = np.where(val_ends > 0, ends[np.maximum(val_ends - 1, 0)], 0)
    byte_starts = np.concatenate(([0], byte_ends[:-1]))
    return [buf[int(s):int(e)] for s, e in zip(byte_starts, byte_ends)]


def decode_postings_batch(bufs) -> list:
    """Iterable of varbyte buffers → list of uint64 doc_id arrays (inverse
    of :func:`encode_postings_batch`), decoded in one whole-batch pass."""
    raws = [np.frombuffer(b, dtype=np.uint8) for b in bufs]
    if not raws:
        return []
    blens = np.fromiter((len(r) for r in raws), dtype=np.int64, count=len(raws))
    flat = np.concatenate(raws) if blens.sum() else np.empty(0, np.uint8)
    if flat.size == 0:
        return [np.empty(0, np.uint64)] * len(raws)
    gaps = vb_decode(flat.tobytes())
    # values per list = count of terminator (high-bit) bytes per byte extent
    is_last = (flat & 0x80) != 0
    byte_starts = np.concatenate(([0], np.cumsum(blens)[:-1]))
    cum_last = np.concatenate(([0], np.cumsum(is_last)))
    vcounts = cum_last[np.cumsum(blens)] - cum_last[byte_starts]
    # batch-wide prefix-sum undo of the per-list delta encoding: global
    # cumsum, then subtract each list's preceding cumulative total
    csum = np.cumsum(gaps, dtype=np.uint64)
    vstarts = np.concatenate(([0], np.cumsum(vcounts)[:-1]))
    base = np.zeros(len(vcounts), dtype=np.uint64)
    nz = vstarts > 0
    base[nz] = csum[vstarts[nz] - 1]
    vals = csum - np.repeat(base, vcounts)
    ends = np.cumsum(vcounts)
    return [vals[int(s):int(e)] for s, e in zip(vstarts, ends)]


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
        return pd.Series(encode_postings_batch(ids), index=ids.index)

    return postings.withColumn("ids_vb", _enc("doc_ids")).drop("doc_ids")


def decompress_postings(postings):
    """Inverse: ids_vb binary → doc_ids array<long>."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _dec(bufs: pd.Series) -> pd.Series:
        arrs = decode_postings_batch(bytes(b) for b in bufs)
        return pd.Series([a.astype(np.int64) for a in arrs], index=bufs.index)

    return postings.withColumn("doc_ids", _dec("ids_vb")).drop("ids_vb")
