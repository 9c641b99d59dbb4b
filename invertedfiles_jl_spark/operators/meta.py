"""Index metadata, SQL surface, and cost accounting.

  * ``describe_index`` — the ``show(io, idx)`` analog
    (/root/reference/src/invfile.jl:19, src/winvfile.jl:23-28): one row of
    (weighting, vocab_size, n_docs, n_posting_rows, total_postings).
  * ``register_index`` — exposes the index tables as temp views so users can
    query them with ``spark.sql`` (the engine's SQL surface).
  * ``search_cost`` — the cost-accounting analog
    (``add_block_evaluations!`` / ``add_distance_evaluations!``,
    /root/reference/src/winvfilesearch.jl:31-32): per-query counts of
    matched posting lists and posting entries scanned — the "per-partition
    lineage + metrics" requirement's query-side half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from invertedfiles_jl_spark.operators.build import InvertedIndex
from invertedfiles_jl_spark.operators.search import query_terms


def describe_index(index: InvertedIndex) -> DataFrame:
    spark = index.postings.sparkSession
    agg = index.postings.agg(
        F.count(F.lit(1)).alias("n_posting_rows"),
        F.sum("df_part").alias("total_postings"),
    ).collect()[0]
    vocab_size = index.vocab.count()
    return spark.createDataFrame(
        [(index.cfg.weighting, int(vocab_size), int(index.stats["n_docs"]),
          int(agg["n_posting_rows"]), int(agg["total_postings"]))],
        "weighting string, vocab_size long, n_docs long, n_posting_rows long, total_postings long",
    )


def register_index(index: InvertedIndex, prefix: str = "if") -> list[str]:
    """Create temp views {prefix}_postings/{prefix}_vocab/{prefix}_docs —
    the SQL surface (spark.sql over index tables)."""
    names = []
    for name, df in (("postings", index.postings), ("vocab", index.vocab),
                     ("docs", index.docs)):
        view = f"{prefix}_{name}"
        df.createOrReplaceTempView(view)
        names.append(view)
    return names


def search_cost(index: InvertedIndex, queries: DataFrame) -> DataFrame:
    """(query_id, n_lists, n_entries) — how many posting lists a query
    touches and how many posting entries a full (unpruned) evaluation
    scans: Σ df over matched terms."""
    qt = query_terms(queries, index.cfg).select("query_id", "term_id").distinct()
    m = index.postings.join(F.broadcast(qt), "term_id")
    return m.groupBy("query_id").agg(
        F.countDistinct("term_id").alias("n_lists"),
        F.sum("df_part").alias("n_entries"),
    )
