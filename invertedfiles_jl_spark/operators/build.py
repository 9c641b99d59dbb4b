"""Index construction — the Spark re-expression of ``append_items!``.

Reference semantics being reproduced (see SURVEY.md §3.1):
  * ``append_items!`` / ``parallel_append!`` (/root/reference/src/invfile.jl:102-187)
    — bulk parallel build: per-doc ``(tokenID, weight)`` streams appended to
    per-term lists, then every posting list sorted by docID.
  * tol / sentinel filters (/root/reference/src/invfile.jl:152-153).
  * ``sizes[objID] = nnz``  (/root/reference/src/invfile.jl:154) → ``docs.nnz``.
  * weighted postings carry ``IdWeight`` (/root/reference/src/winvfile.jl:45-47),
    binary postings carry bare ids (/root/reference/src/binvfile.jl:60-62).

Spark-first design, one shuffle per stage boundary:

  corpus ──(JVM tokenize + posexplode)──▶ (doc_id, term)           narrow
         ──groupBy(doc_id, term).count()──▶ tf                     shuffle 1 (partial agg map-side)
  tf     ──groupBy(term)──▶ vocab(term, df, cf)                    shuffle 2 (reuses term clustering)
  tf ⋈ broadcast(hot_terms) ──groupBy(term_id, salt)
         .agg(sorted posting arrays)──▶ postings                   shuffle 3
  tf     ──groupBy(doc_id)──▶ docs(doc_len, nnz, norm, sha)        shuffle 4
  stats  = single-row aggregate (n_docs, avgdl)                    broadcast-sized

At 100 TB: every aggregation is partial+final (map-side combine), the only
wide rows are hot-term posting arrays, which salting caps at
``df/salt_buckets`` entries; AQE skew-join handles residual skew.  No window
over a global ordering, no collect() of anything larger than the stats row.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.functions.tokenize import tokens_sql


@dataclass
class InvertedIndex:
    """Handle bundling the four tables of a built index.

    The index stores no documents — like the reference
    (``database(idx) = nothing``, /root/reference/src/invfile.jl:20) the
    corpus stays a separate table; ``docs`` here is per-doc *statistics*.
    """

    docs: DataFrame      # doc_id, doc_len, nnz, norm, content_sha256
    vocab: DataFrame     # term, term_id, df, cf
    postings: DataFrame  # term_id, term, salt, df_part, doc_ids, weights, max_weight
    stats: dict          # n_docs, avg_doc_len, vocab_size
    cfg: IndexConfig

    @property
    def n_docs(self) -> int:
        return self.stats["n_docs"]


def term_id_col(term_col):
    """Stable 64-bit term id: xxhash64 — computed inline, no dictionary
    join, no global row_number (which would single-partition a 10^9-term
    vocabulary).  Collisions merge two posting lists with probability
    ~n²/2⁶⁵ — negligible quality impact at corpus scale, zero at test scale.
    """
    return F.xxhash64(term_col)


def doc_term_freqs(corpus: DataFrame, cfg: IndexConfig,
                   doc_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """corpus → (doc_id, term, tf).  Narrow until the single tf shuffle."""
    toks = corpus.select(
        F.col(doc_col).alias("doc_id"),
        F.explode(F.expr(tokens_sql(content_col, cfg))).alias("term"),
    )
    return toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


def build_index(
    corpus: DataFrame,
    cfg: IndexConfig | None = None,
    doc_col: str = "doc_id",
    content_col: str = "content",
) -> InvertedIndex:
    """Build the full index from a corpus DataFrame with a long ``doc_id``
    and a string content column.  Returns lazily-planned DataFrames; callers
    persist via ``plans.pipeline`` for the checkpointed/resumable path.
    """
    cfg = cfg or IndexConfig()
    spark = corpus.sparkSession

    tf = doc_term_freqs(corpus, cfg, doc_col, content_col)

    # --- docs: per-doc stats (sizes[objID]=nnz analog + BM25 doc_len + L2 norm)
    docs = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("doc_len"),
        F.count(F.lit(1)).alias("nnz"),
        F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("norm"),
    )
    sha = corpus.select(
        F.col(doc_col).alias("doc_id"),
        F.sha2(F.col(content_col).cast("binary"), 256).alias("content_sha256"),
    )
    docs = docs.join(sha, "doc_id", "right")  # keep empty docs (doc_len null→0)
    docs = docs.fillna({"doc_len": 0, "nnz": 0, "norm": 0.0})

    # --- vocab
    vocab = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    ).withColumn("term_id", term_id_col(F.col("term")))

    # --- stats (single row; the only collect in the build)
    srow = corpus.select(
        F.count(F.lit(1)).alias("n_docs"),
    ).collect()[0]
    n_docs = srow["n_docs"]
    arow = docs.select(F.avg("doc_len").alias("avgdl")).collect()[0]
    stats = {
        "n_docs": int(n_docs),
        "avg_doc_len": float(arow["avgdl"] or 0.0),
    }

    # --- postings: weight per (term, doc), salted group-agg into sorted lists
    wt = cfg.weight_dtype
    if cfg.weighting == "binary":
        weighted = tf.select("doc_id", "term", F.lit(1.0).cast(wt).alias("weight"))
    elif cfg.weighting == "normcosine":
        weighted = tf.join(docs.select("doc_id", "norm"), "doc_id").select(
            "doc_id", "term",
            (F.col("tf") / F.col("norm")).cast(wt).alias("weight"),
        )
    else:  # bm25: store raw tf; saturation needs doc_len at query time, so
        # fold the length-normalized saturated tf in now — it is query-
        # independent: tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)).
        k1, b = float(cfg.bm25_k1), float(cfg.bm25_b)
        avgdl = stats["avg_doc_len"] or 1.0
        weighted = tf.join(docs.select("doc_id", "doc_len"), "doc_id").select(
            "doc_id", "term",
            (
                F.col("tf") * F.lit(k1 + 1.0)
                / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.lit(avgdl)))
            ).cast(wt).alias("weight"),
        )

    # tol pruning at build, like /root/reference/src/invfile.jl:152
    weighted = weighted.filter(F.col("weight") >= F.lit(float(cfg.tol)))

    # Hot-term salting: doc-RANGE-disjoint buckets (not hash) so that the
    # per-bucket sorted sub-lists concatenate in bucket order into one
    # globally doc-sorted list — the invariant delta-gap encoding needs.
    hot = vocab.filter(F.col("df") > cfg.salt_df_threshold).select("term", F.lit(True).alias("is_hot"))
    max_doc = n_docs  # doc ids are dense-ish; range split only needs an upper bound
    weighted = (
        weighted.join(F.broadcast(hot), "term", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("is_hot").isNotNull(),
                F.least(
                    F.lit(cfg.salt_buckets - 1),
                    (F.col("doc_id") * cfg.salt_buckets / F.lit(max(max_doc, 1) + 1)).cast("int"),
                ),
            ).otherwise(F.lit(0)),
        )
        .drop("is_hot")
    )

    postings = (
        weighted.groupBy("term", "salt")
        .agg(
            F.count(F.lit(1)).alias("df_part"),
            F.sort_array(F.collect_list(F.struct("doc_id", "weight"))).alias("plist"),
        )
        .select(
            term_id_col(F.col("term")).alias("term_id"),
            "term",
            "salt",
            "df_part",
            F.col("plist.doc_id").alias("doc_ids"),
            F.col("plist.weight").alias("weights"),
            F.array_max(F.col("plist.weight")).alias("max_weight"),
        )
    )
    stats["vocab_size"] = None  # filled lazily by callers that need it

    if cfg.compress:
        from invertedfiles_jl_spark.operators.codec import compress_postings

        postings = compress_postings(postings)

    return InvertedIndex(docs=docs, vocab=vocab, postings=postings, stats=stats, cfg=cfg)
