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


def corpus_profile(corpus: DataFrame, cfg=None,
                   doc_col: str = "doc_id",
                   content_col: str = "content") -> DataFrame:
    """One-row corpus statistics report — the profiling step a curation
    pipeline runs before sizing an index build: document-length
    percentiles drive ``spark.sql.files.maxPartitionBytes``/salting
    choices, the df tail identifies hot terms for ``salt_df_threshold``.

    Columns: n_docs, total_tokens, distinct_terms, doc_len p50/p90/p99,
    doc_len_max, df_p90, df_max.  Uses EXACT ``percentile`` so the DuckDB
    oracle (``quantile_cont``) reproduces every digit; at 100 TB swap in
    ``approx_percentile`` (same column shape, documented trade) — exact
    percentile is a per-metric sort.
    """
    from invertedfiles_jl_spark.config import IndexConfig
    from invertedfiles_jl_spark.operators.build import doc_term_freqs

    cfg = cfg or IndexConfig()
    tf = doc_term_freqs(corpus, cfg, doc_col, content_col)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    a = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_len").cast("long").alias("total_tokens"),
        F.expr("percentile(doc_len, array(0.5, 0.9, 0.99))").alias("dp"),
        F.max("doc_len").cast("long").alias("doc_len_max"),
    )
    b = dfs.agg(
        F.count(F.lit(1)).cast("long").alias("distinct_terms"),
        F.expr("percentile(df, 0.9)").alias("df_p90"),
        F.max("df").cast("long").alias("df_max"),
    )
    return a.crossJoin(b).select(
        "n_docs", "total_tokens", "distinct_terms",
        F.round(F.col("dp")[0], 6).alias("doc_len_p50"),
        F.round(F.col("dp")[1], 6).alias("doc_len_p90"),
        F.round(F.col("dp")[2], 6).alias("doc_len_p99"),
        "doc_len_max",
        F.round("df_p90", 6).alias("df_p90"),
        "df_max",
    )
