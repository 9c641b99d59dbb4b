"""Plan B — vectorized MaxScore top-k scorer (``mapInPandas``-family path).

The reference's query kernel is a k-way merge over doc-sorted posting lists
into a bounded sorted knn queue (``xmerge!`` + ``knnqueue(KnnSorted, k)``,
/root/reference/src/winvfilesearch.jl:28-34, /root/reference/src/InvertedFiles.jl:57),
with SIMD scoring (/root/reference/src/winvfilesearch.jl:11).  A doc-at-a-time
WAND loop is the classic single-machine answer but is per-row Python here; the
Spark-idiomatic equivalent is term-at-a-time **MaxScore** (Turtle & Flood 1995)
over numpy vectors:

  * lists sorted by upper bound (q_weight · max_weight) descending;
  * union-accumulate until the kth candidate score exceeds the suffix bound;
  * remaining (non-essential) lists may only update EXISTING candidates —
    a sorted-array intersection (np.searchsorted), never growing the pool.

Everything runs inside one ``applyInPandas`` per query group: the broadcast
join has already reduced data to the matched lists, so each group holds just
the query's postings.  Arrow moves the arrays; numpy does the math; Python
touches O(#lists) objects, not O(#postings).

Exactness: MaxScore is rank-safe (no approximation) — gated by the
rank-identity pytest vs Plan A and the brute-force oracle.
"""

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invertedfiles_jl_spark.operators.build import InvertedIndex
from invertedfiles_jl_spark.operators.search import query_terms

_OUT_SCHEMA = "query_id long, rank int, doc_id long, score double"


def _maxscore_group(pdf, k: int, rank_round):
    """Score one query's matched posting lists; return top-k rows."""
    import pandas as pd

    qid = int(pdf["query_id"].iloc[0])
    qws = pdf["qw"].to_numpy(dtype=np.float64)
    id_arrays = []
    w_arrays = []
    for i in range(len(pdf)):
        if "ids_vb" in pdf.columns and pdf["ids_vb"].iloc[i] is not None:
            from invertedfiles_jl_spark.operators.codec import decode_posting

            ids = decode_posting(bytes(pdf["ids_vb"].iloc[i])).astype(np.int64)
        else:
            ids = np.asarray(pdf["doc_ids"].iloc[i], dtype=np.int64)
        id_arrays.append(ids)
        w_arrays.append(np.asarray(pdf["weights"].iloc[i], dtype=np.float64))
    maxw = pdf["max_weight"].to_numpy(dtype=np.float64)

    bounds = qws * maxw
    order = np.argsort(-bounds, kind="stable")
    bounds = bounds[order]
    suffix = np.concatenate([np.cumsum(bounds[::-1])[::-1], [0.0]])

    acc_ids = np.empty(0, dtype=np.int64)   # kept sorted
    acc_scores = np.empty(0, dtype=np.float64)
    theta = -np.inf
    pruned = 0
    for j, li in enumerate(order):
        ids, contrib = id_arrays[li], qws[li] * w_arrays[li]
        # strict > : at equality a pruned doc could still tie the kth score
        # and win the doc_id tie-break
        if theta > suffix[j]:
            # non-essential: docs outside acc can never reach theta
            pos = np.searchsorted(acc_ids, ids)
            pos_c = np.minimum(pos, len(acc_ids) - 1)
            hit = acc_ids[pos_c] == ids
            np.add.at(acc_scores, pos_c[hit], contrib[hit])
            pruned += int((~hit).sum())
        else:
            both_ids = np.concatenate([acc_ids, ids])
            both_sc = np.concatenate([acc_scores, contrib])
            acc_ids, inv = np.unique(both_ids, return_inverse=True)
            acc_scores = np.bincount(inv, weights=both_sc, minlength=len(acc_ids))
        if len(acc_scores) >= k:
            theta = np.partition(acc_scores, len(acc_scores) - k)[len(acc_scores) - k]

    if acc_ids.size == 0:
        return pd.DataFrame(columns=["query_id", "rank", "doc_id", "score"]).astype(
            {"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"}
        )
    key = np.round(acc_scores, rank_round) if rank_round is not None else acc_scores
    sel = np.lexsort((acc_ids, -key))[:k]
    return pd.DataFrame(
        {
            "query_id": np.full(len(sel), qid, dtype=np.int64),
            "rank": np.arange(1, len(sel) + 1, dtype=np.int32),
            "doc_id": acc_ids[sel],
            "score": acc_scores[sel],
        }
    )


def wand_topk(
    index: InvertedIndex,
    queries: DataFrame,
    k: int = 10,
    rank_round: "int | None" = None,
) -> DataFrame:
    """MaxScore top-k for a bm25 or normcosine index.

    Output: (query_id, rank, doc_id, score) — for normcosine, ``score`` is
    the dot product; use :func:`wand_cosine_topk` for the distance form.
    """
    assert index.cfg.weighting in ("bm25", "normcosine")
    qt = query_terms(queries, index.cfg)
    if index.cfg.weighting == "bm25":
        n = float(index.stats["n_docs"])
        qt = index.vocab.join(F.broadcast(qt), "term").select(
            "query_id", "term",
            (
                F.col("qtf")
                * F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
            ).alias("qw"),
        )
    else:
        qnorm = qt.groupBy("query_id").agg(
            F.sqrt(F.sum(F.col("qtf") * F.col("qtf"))).alias("qn")
        )
        qt = qt.join(qnorm, "query_id").select(
            "query_id", "term", (F.col("qtf") / F.col("qn")).alias("qw")
        )

    cols = ["query_id", "qw", "weights", "max_weight"]
    cols.append("ids_vb" if "ids_vb" in index.postings.columns else "doc_ids")
    matched = index.postings.join(F.broadcast(qt), "term").select(*cols)

    def fn(pdf):
        return _maxscore_group(pdf, k, rank_round)

    return matched.groupBy("query_id").applyInPandas(fn, _OUT_SCHEMA)


def wand_cosine_topk(index: InvertedIndex, queries: DataFrame, k: int = 10,
                     rank_round: "int | None" = None) -> DataFrame:
    """Normalized-cosine distance form: dist = 1 − dot
    (/root/reference/src/winvfilesearch.jl:8-16), ascending."""
    res = wand_topk(index, queries, k, rank_round)
    return res.select(
        "query_id", "rank", "doc_id", (F.lit(1.0) - F.col("score")).alias("dist")
    )
