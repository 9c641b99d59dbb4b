"""Hybrid retrieval — reciprocal-rank fusion of the inverted-index (sparse)
ranking with the embedding-cosine (dense) ranking.

The reference is a pure inverted-file engine; a training-data pipeline at
100 TB serves *hybrid* retrieval: BM25 recall from the fulltext index plus
semantic recall from an embedding index, fused per query.  RRF
(Cormack/Clarke/Buettcher, SIGIR 2009) is the standard score-free fusion:

    rrf(d) = Σ_lists 1 / (rrf_k + rank_list(d))

It needs only the per-list *ranks* — no score calibration between BM25 and
cosine — and is therefore exactly reproducible across engines whenever the
input rankings are (both of ours are driver-gated rank-identical).

Scale shape: each input ranking is already a bounded top-``depth`` per query
(Q·depth rows each — tiny), so the fusion is one ``unionByName`` plus one
(query_id, doc_id) aggregation: a single shuffle over O(Q·depth·n_lists)
rows regardless of corpus size.  The expensive parts are the upstream
rankings, which use the engine's existing scale paths (Plan A / WAND /
doc-sharded for sparse, IVF for dense).

Determinism note: a candidate appears in at most ``n_lists`` rankings, and
IEEE-754 addition of two doubles is commutative, so with two lists the RRF
sum is bit-exact regardless of Spark's aggregation order — safe to
value-hash against the DuckDB oracle without a rank_round crutch (we still
rank on round(rrf, 9) for uniformity with every other oracle-gated plan).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invertedfiles_jl_spark.operators.ann import brute_force_topk
from invertedfiles_jl_spark.operators.build import InvertedIndex
from invertedfiles_jl_spark.operators.search import bm25_topk, topk


def rrf_fuse(rankings: list[DataFrame], k: int = 10, rrf_k: int = 60,
             id_col: str = "doc_id") -> DataFrame:
    """Fuse per-query rankings by reciprocal-rank: each input must carry
    (query_id, rank, ``id_col``).  Returns (query_id, rank, doc_id, rrf,
    n_lists) — ``n_lists`` = how many input rankings surfaced the doc.
    """
    contribs = [
        r.select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank"))).alias("contrib"),
        )
        for r in rankings
    ]
    u = reduce(DataFrame.unionByName, contribs)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("rrf"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    ranked = topk(fused.select("query_id", "doc_id", "rrf"), k, "rrf",
                  ascending=False, rank_round=9)
    # ranked is bounded Q·k → broadcast into the n_lists recovery join
    return F.broadcast(ranked).join(
        fused.select("query_id", "doc_id", "n_lists"),
        ["query_id", "doc_id"]).select(
        "query_id", "rank", "doc_id", "rrf", "n_lists")


def minmax_fuse(rankings: list[DataFrame], weights: list[float], k: int = 10,
                score_cols: list[str] | None = None,
                score_round: int = 6, rank_round: int = 9) -> DataFrame:
    """Score-based fusion — per-query min-max normalization + weighted sum
    (the Elasticsearch/Vespa "normalized linear combination" alternative to
    :func:`rrf_fuse` when relative score GAPS should matter, not just ranks).

    Each input ranking must carry (query_id, doc_id, score-ish column) with
    HIGHER = BETTER (callers convert distances to similarities first).  Per
    (query, list): norm = (s − min)/(max − min) over that query's candidate
    set, 1.0 when the set has a single score value; fused = Σ w_i · norm_i
    with a doc absent from a list contributing nothing for it.

    Determinism contract (what makes this value-hashable across engines):
    input scores are rounded to ``score_round`` BEFORE normalization, so
    both engines normalize identical doubles through an identical IEEE
    expression chain; a doc joins ≤ len(rankings) lists and two-double
    addition is commutative, so with two lists the fused sum is bit-exact
    regardless of aggregation order (same argument as :func:`rrf_fuse`).

    Scale shape: identical to RRF — inputs are bounded top-depth lists
    (Q·depth rows), the min/max is a partial-aggregable groupBy over those
    tiny lists, and the fuse is one shuffle over O(Q·depth·n_lists) rows.
    """
    if score_cols is None:
        score_cols = ["score"] * len(rankings)
    sides = []
    for r, w, c in zip(rankings, weights, score_cols):
        s = r.select("query_id", "doc_id", F.round(F.col(c), score_round).alias("s"))
        mm = s.groupBy("query_id").agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
        sides.append(
            s.join(F.broadcast(mm), "query_id").select(
                "query_id", "doc_id",
                (
                    F.lit(float(w))
                    * F.when(F.col("hi") == F.col("lo"), F.lit(1.0)).otherwise(
                        (F.col("s") - F.col("lo")) / (F.col("hi") - F.col("lo"))
                    )
                ).alias("contrib"),
            )
        )
    u = reduce(DataFrame.unionByName, sides)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("fused"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    ranked = topk(fused.select("query_id", "doc_id", "fused"), k, "fused",
                  ascending=False, rank_round=rank_round)
    # ranked is bounded Q·k → broadcast into the n_lists recovery join
    return F.broadcast(ranked).join(
        fused.select("query_id", "doc_id", "n_lists"),
        ["query_id", "doc_id"]).select(
        "query_id", "rank", "doc_id", "fused", "n_lists")


def hybrid_minmax_topk(index: InvertedIndex, emb: DataFrame,
                       text_queries: DataFrame, vec_queries: DataFrame,
                       k: int = 10, depth: int = 20, alpha: float = 0.5,
                       dense_topk=None) -> DataFrame:
    """Hybrid top-k under min-max weighted-sum fusion: ``alpha`` weights the
    BM25 side, ``1 − alpha`` the dense-cosine side.  Same candidate
    generation as :func:`hybrid_rrf_topk` (bounded top-``depth`` per list,
    existing scale paths upstream); only the combine differs."""
    sparse = bm25_topk(index, text_queries, k=depth, rank_round=6)
    dense_fn = dense_topk or (
        lambda e, q, kk: brute_force_topk(e, q, k=kk, exclude_self=False, rank_round=6))
    dense = dense_fn(emb, vec_queries, depth).withColumnRenamed("vec_id", "doc_id")
    return minmax_fuse(
        [sparse.select("query_id", "doc_id", "score"),
         dense.select("query_id", "doc_id", "cos")],
        weights=[alpha, 1.0 - alpha], k=k, score_cols=["score", "cos"])


def hybrid_rrf_topk(index: InvertedIndex, emb: DataFrame,
                    text_queries: DataFrame, vec_queries: DataFrame,
                    k: int = 10, depth: int = 20, rrf_k: int = 60,
                    dense_topk=None) -> DataFrame:
    """Hybrid top-k: BM25 over the inverted index ∪ cosine over the
    embedding table, RRF-fused.

    ``text_queries`` — (query_id, content); ``vec_queries`` — (query_id,
    q_emb).  The two sides share ``query_id``; candidates are identified by
    doc_id ≡ vec_id (the fixture contract: row i of ``embeddings`` embeds
    document i).  ``dense_topk`` defaults to the exact brute-force ranker;
    pass ``ivf_topk``-shaped callable for the approximate scale path.
    """
    sparse = bm25_topk(index, text_queries, k=depth, rank_round=6)
    dense_fn = dense_topk or (
        lambda e, q, k: brute_force_topk(e, q, k=k, exclude_self=False, rank_round=6))
    dense = dense_fn(emb, vec_queries, depth).withColumnRenamed("vec_id", "doc_id")
    return rrf_fuse(
        [sparse.select("query_id", "rank", "doc_id"),
         dense.select("query_id", "rank", "doc_id")],
        k=k, rrf_k=rrf_k)
