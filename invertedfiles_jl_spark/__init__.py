"""invertedfiles_jl_spark — a PySpark-native inverted-file engine.

A from-scratch re-expression of the capabilities of sadit/InvertedFiles.jl
(reference snapshot at /root/reference) on Apache Spark: SPIMI-style
posting-list construction over DataFrames, BM25 / normalized-cosine /
set-distance top-k retrieval, delta-gap + varbyte compression, salt-aware
skew handling, and checkpoint-resumable staged builds.

This is NOT a port: the reference is a single-machine in-memory Julia
library (src/invfile.jl, src/winvfile.jl, src/binvfile.jl); here every
operator is expressed as declarative DataFrame plans optimized by Catalyst,
with vectorized Arrow/pandas UDFs only where built-ins cannot express the
semantics (varbyte codec, WAND scorer).
"""

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.build import build_index
from invertedfiles_jl_spark.operators.search import (
    bm25_topk,
    cosine_topk,
    set_distance_topk,
)

__version__ = "0.1.0"

__all__ = [
    "IndexConfig",
    "build_index",
    "bm25_topk",
    "cosine_topk",
    "set_distance_topk",
]
