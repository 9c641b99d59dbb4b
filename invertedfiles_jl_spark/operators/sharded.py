"""Doc-sharded batch scoring — the zero-duplication query path at cluster
scale.

The per-query-group scorer (``wand.wand_topk``) shuffles a copy of every
matched posting list to each query's group: for a 500-query batch hitting
Zipfian hot terms that is GBs of duplicated list traffic.  The classic
distributed-IR answer (and SURVEY.md §3.2's Plan B sketch) is to shard the
index BY DOCUMENT: each shard holds the sub-lists of *all* terms restricted
to its doc range, so a doc's full score is computable inside one shard.
A query batch then becomes:

    postings (sharded)
      ⋉ broadcast(query term_ids)          prune unmatched term rows, JVM-side
      → groupBy(shard).applyInPandas       full scores + per-shard top-k
      → window top-k over S×Q×k rows       final merge (tiny)

``groupBy(shard)`` makes the co-location invariant EXPLICIT: every row of a
shard reaches exactly one kernel call regardless of how the shards table was
produced (cached, repartitioned, or re-read from parquet where file splits
ignore the write-time layout).  The shuffle it costs moves only the
query-matched rows — the broadcast semi-join prunes first.

Per-shard top-k under the same total order (HALF_UP-rounded score desc,
doc_id asc — bit-identical to the final window's ``F.round``) is rank-safe:
any global top-k doc is in its own shard's top-k.  This mirrors the
reference's two-level knnqueue merge contract (bounded per-thread queues
merged into one result, /root/reference/src/InvertedFiles.jl:57) — the shard
is the thread, the final window is the merge.

Sharding reuses the hot-term salt invariant (doc-range-disjoint sub-lists,
``build.postings_table``) generalized to every term, so delta-gap encoding
stays valid per sub-list.  ``shard_postings`` is a one-time build-side
shuffle; per-batch traffic after it is the pruned-row shuffle only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invertedfiles_jl_spark.operators.build import InvertedIndex
from invertedfiles_jl_spark.operators.search import query_terms, topk

_OUT_SCHEMA = "query_id long, doc_id long, score double"


def _round_half_up(a: np.ndarray, ndigits: int) -> np.ndarray:
    """HALF_UP rounding for non-negative values — matches Spark's
    ``F.round`` (java.math.RoundingMode.HALF_UP), unlike ``np.round``
    (half-to-even).  Keeping both cut points on the same rule preserves the
    per-shard top-k rank-safety at rounding boundaries."""
    p = 10.0 ** ndigits
    return np.floor(a * p + 0.5) / p


def shard_postings(index: InvertedIndex, n_shards: int = 32) -> DataFrame:
    """Re-layout postings into ``n_shards`` doc-range shards.

    Every term's list is split into doc-range-disjoint sub-lists (the salting
    scheme applied universally), then grouped per (shard, term_id).  Handles
    compressed indexes (``ids_vb``) by decoding before the re-layout.
    Build-time cost: one shuffle of the index.
    Returns postings(shard, term_id, doc_ids, weights, max_weight).
    """
    max_doc = int(index.stats["n_docs"])
    postings = index.postings
    if "ids_vb" in postings.columns:
        from invertedfiles_jl_spark.operators.codec import decompress_postings

        postings = decompress_postings(postings)
    flat = postings.select(
        "term_id", F.explode(F.arrays_zip("doc_ids", "weights")).alias("e")
    ).select(
        "term_id",
        F.col("e.doc_ids").alias("doc_id"),
        F.col("e.weights").alias("weight"),
    )
    shard = F.least(
        F.lit(n_shards - 1),
        (F.col("doc_id") * n_shards / F.lit(max_doc + 1)).cast("int"),
    )
    return (
        flat.withColumn("shard", shard)
        .groupBy("shard", "term_id")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "weight"))).alias("plist"))
        .select(
            "shard", "term_id",
            F.col("plist.doc_id").alias("doc_ids"),
            F.col("plist.weight").alias("weights"),
            F.array_max(F.col("plist.weight")).alias("max_weight"),
        )
        .repartition(n_shards, "shard")
    )


def _score_kernel(qmap_bc, k: int, rank_round):
    """applyInPandas kernel: one call per shard — accumulate per-query
    scores over the shard's posting rows, emit the shard's top-k per query.

    ``qmap_bc``: sc.broadcast of {term_id → (qids int64 array, qws float64
    array)} — shipped once per executor, not per task.  All arithmetic is
    numpy over whole posting arrays; Python touches O(#rows) objects.
    """
    import pandas as pd

    def kernel(pdf):
        qmap = qmap_bc.value
        per_q_ids: dict[int, list] = {}
        per_q_contrib: dict[int, list] = {}
        tids = pdf["term_id"].to_numpy()
        ids_col = pdf["doc_ids"].to_numpy()
        w_col = pdf["weights"].to_numpy()
        for i in range(len(pdf)):
            hit = qmap.get(int(tids[i]))
            if hit is None:
                continue
            ids = np.asarray(ids_col[i], dtype=np.int64)
            ws = np.asarray(w_col[i], dtype=np.float64)
            for qid, qw in zip(*hit):
                per_q_ids.setdefault(int(qid), []).append(ids)
                per_q_contrib.setdefault(int(qid), []).append(qw * ws)
        if not per_q_ids:
            return pd.DataFrame(
                {"query_id": np.empty(0, np.int64),
                 "doc_id": np.empty(0, np.int64),
                 "score": np.empty(0, np.float64)}
            )
        out_q, out_d, out_s = [], [], []
        for qid, id_chunks in per_q_ids.items():
            all_ids = np.concatenate(id_chunks)
            all_sc = np.concatenate(per_q_contrib[qid])
            uids, inv = np.unique(all_ids, return_inverse=True)
            scores = np.bincount(inv, weights=all_sc, minlength=len(uids))
            key = _round_half_up(scores, rank_round) if rank_round is not None else scores
            sel = np.lexsort((uids, -key))[:k]  # same total order as topk()
            out_q.append(np.full(len(sel), qid, dtype=np.int64))
            out_d.append(uids[sel])
            out_s.append(scores[sel])
        return pd.DataFrame(
            {"query_id": np.concatenate(out_q),
             "doc_id": np.concatenate(out_d),
             "score": np.concatenate(out_s)}
        )

    return kernel


def sharded_topk(
    index: InvertedIndex,
    queries: DataFrame,
    k: int = 10,
    n_shards: int = 32,
    rank_round: "int | None" = None,
    sharded: DataFrame | None = None,
) -> DataFrame:
    """Batch BM25 (or dot-product) top-k over a doc-sharded layout.

    Pass ``sharded=`` a cached :func:`shard_postings` result to amortize the
    re-layout across batches (the intended serving mode); otherwise it is
    derived on the fly.  Rank-identical to ``bm25_topk`` (pytest gate,
    including over a written-then-re-read shards table).
    """
    assert index.cfg.weighting in ("bm25", "normcosine")
    spark = queries.sparkSession
    qt = query_terms(queries, index.cfg)
    if index.cfg.weighting == "bm25":
        n = float(index.stats["n_docs"])
        qt = index.vocab.select("term_id", "df").join(F.broadcast(qt), "term_id").select(
            "query_id", "term_id",
            (
                F.col("qtf")
                * F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
            ).alias("qw"),
        )
    else:
        qn = qt.groupBy("query_id").agg(
            F.sqrt(F.sum(F.col("qtf") * F.col("qtf"))).alias("qn")
        )
        qt = qt.join(qn, "query_id").select(
            "query_id", "term_id", (F.col("qtf") / F.col("qn")).alias("qw")
        )

    # the query batch is tiny — collect once, build term_id → (qids, qws)
    qrows = qt.collect()
    qmap: dict = {}
    for r in qrows:
        qmap.setdefault(int(r["term_id"]), ([], []))
        qmap[r["term_id"]][0].append(r["query_id"])
        qmap[r["term_id"]][1].append(r["qw"])
    qmap = {t: (np.asarray(a, np.int64), np.asarray(b, np.float64))
            for t, (a, b) in qmap.items()}
    if not qmap:
        return spark.createDataFrame([], "query_id long, rank int, doc_id long, score double")
    qmap_bc = spark.sparkContext.broadcast(qmap)

    sharded = sharded if sharded is not None else shard_postings(index, n_shards)
    # JVM-side semi-join prune: only matched term rows reach Arrow.
    qterms = spark.createDataFrame([(t,) for t in qmap], "term_id long")
    pruned = sharded.join(F.broadcast(qterms), "term_id", "left_semi")
    # groupBy(shard) guarantees each shard lands wholly in one kernel call
    # whatever the physical layout of `sharded` is (see module docstring)
    partials = pruned.groupBy("shard").applyInPandas(
        _score_kernel(qmap_bc, k, rank_round), _OUT_SCHEMA
    )
    return topk(partials, k, "score", ascending=False, rank_round=rank_round)
