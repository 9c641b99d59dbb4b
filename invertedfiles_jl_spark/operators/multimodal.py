"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
signatures, partition-preserving transforms) is real and tested; the actual
media decode is STUBBED — image/audio libraries are not in this container.
``mode="stub"`` produces a deterministic fake feature vector from the payload
bytes; ``mode="real"`` raises NotImplementedError at the decode site with the
library it would use, so swapping in a real decoder is a one-function change.
"""

import hashlib

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "doc_id long, modality string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)

FEATURES_SCHEMA = "doc_id long, modality string, feature array<float>"


def attach_media(df: DataFrame, doc_col: str = "doc_id",
                 content_col: str = "content") -> DataFrame:
    """Derive a deterministic media table from a text corpus: payload =
    utf-8 bytes (an opaque blob as far as downstream is concerned), metadata
    derived from an md5-based content hash.  Stands in for
    `images/audio/video` ingestion — same schema a real pipeline would
    carry.  The hash is ``ascii`` arithmetic over the md5 hex digest so the
    driver's DuckDB oracle can reproduce it exactly (xxhash64 has no DuckDB
    analog)."""
    payload = F.col(content_col).cast("binary")
    hexd = F.md5(F.col(content_col))
    h = (
        F.ascii(F.substring(hexd, 1, 1)) * 65536
        + F.ascii(F.substring(hexd, 2, 1)) * 256
        + F.ascii(F.substring(hexd, 3, 1))
    )
    return df.select(
        F.col(doc_col).alias("doc_id"),
        F.when(h % 3 == 0, "image").when(h % 3 == 1, "audio").otherwise("video").alias("modality"),
        payload.alias("payload"),
        F.struct(
            (h % 1920 + 1).cast("int").alias("width"),
            (h % 1080 + 1).cast("int").alias("height"),
            (h % 300 + 1).cast("int").alias("n_frames"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _stub_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake feature vector: sha256-seeded bytes → floats in
    [0, 1).  Replace with a real model forward pass in production."""
    d = hashlib.sha256(payload).digest()
    reps = (dim * 4 + len(d) - 1) // len(d)
    raw = (d * reps)[: dim * 4]
    ints = np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
    return (ints / 2 ** 32).astype(np.float32)


def extract_features(media: DataFrame, mode: str = "stub",
                     batch_size_hint: int = 64) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out, schema
    fixed — exactly the shape a GPU-decoder stage would use (payload-major
    batches, no shuffle, partition-preserving)."""
    if mode not in ("stub", "real"):
        raise ValueError(f"unknown mode {mode!r}")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real decode requires pillow/torchaudio/av — not in this "
                    "container; plug the decoder in here"
                )
            feats = [
                _stub_features(bytes(p)).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "modality": pdf["modality"], "feature": feats}
            )

    return media.mapInPandas(gen, FEATURES_SCHEMA)


def features_long(media: DataFrame, mode: str = "stub",
                  round_digits: int = 7) -> DataFrame:
    """(doc_id, modality, dim, value) — exploded scalar form of
    :func:`extract_features` for relational consumers (and the driver's
    value-hash compare, which needs hashable scalar columns, not
    ``array<float>``).  ``value`` is the float32 feature widened to double
    and rounded, bit-stable across engines."""
    feats = extract_features(media, mode)
    return feats.select(
        "doc_id", "modality", F.posexplode("feature").alias("dim", "v")
    ).select(
        "doc_id", "modality", F.col("dim").cast("int").alias("dim"),
        F.round(F.col("v").cast("double"), round_digits).alias("value"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Expand video rows into (doc_id, frame_idx) sampling plans — pure
    column ops (sequence/explode), no decode needed for planning."""
    vids = media.filter(F.col("modality") == "video")
    return vids.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
