"""End-to-end corpus curation: the composed keep/drop verdict a training-
data pipeline actually ships — language gate → quality gate → exact dedup →
near-dup dedup, each doc labeled with the FIRST gate it fails.

The reference has no curation concept (it consumes pre-vectorized data,
/root/reference/src/invfile.jl:53-80); this operator composes the engine's
additive text/dedup surface into the standard filter chain (CCNet/RefinedWeb
style) so one call — and one oracle row — gates the whole decision.

Scale shape: the lang and quality gates are pure Column expressions over the
same scan (no join between them — ``functions.text`` exposes them as
Columns precisely for this); the two dedup verdicts arrive as
broadcast-joined DROP LISTS (only docs in ≥2-member duplicate groups, a
vanishingly small relation next to the corpus; the lists themselves come
from the hash-bucketed / LSH-banded dedup plans, never an n² pair join).
One map-side pass + two broadcast joins total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.functions.text import pred_lang_col, quality_cols
from invertedfiles_jl_spark.functions.tokenize import tokens_sql
from invertedfiles_jl_spark.operators.dedup import (
    exact_duplicates,
    near_duplicate_clusters,
)


def curate(corpus: DataFrame, cfg: IndexConfig | None = None,
           langs: tuple[str, ...] = ("en",), quality_min: float = 0.45,
           near_n: int = 3, near_threshold: float = 0.5,
           max_top_bigram_frac: float | None = None,
           doc_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """(doc_id, keep, reason) for every corpus doc.

    ``reason`` is the FIRST failing gate in the fixed order ``lang`` →
    ``quality`` → ``repetition`` → ``exact_dup`` → ``near_dup``, or ``ok``
    when the doc survives them all (then ``keep`` is true).  Gate
    semantics:

    * ``lang``      — ``pred_lang`` (marker-token argmax) not in ``langs``;
    * ``quality``   — heuristic quality score (rounded to 6 dp, the same
                      value ``quality_score`` emits) below ``quality_min``;
    * ``repetition`` — Gopher-style: the most frequent bigram consumes more
                      than ``max_top_bigram_frac`` of the bigram stream
                      (rounded 6 dp, same value ``repetition_stats`` emits);
                      gate is OFF when the threshold is None (default);
    * ``exact_dup`` — content sha256 collides with a LOWER doc_id (the
                      keep-min policy of ``exact_duplicates``);
    * ``near_dup``  — in a MinHash near-dup component whose representative
                      (min doc_id) is another doc
                      (``near_duplicate_clusters``).

    Order matters and is part of the contract: a non-English exact
    duplicate reports ``lang``, mirroring how production pipelines count
    removal attribution stage by stage.
    """
    cfg = cfg or IndexConfig()
    t = tokens_sql(content_col, cfg)
    _, _, quality = quality_cols(t)

    ex = exact_duplicates(corpus, doc_col, content_col).filter(
        F.col("doc_id") != F.col("canonical_id")
    ).select("doc_id", F.lit(True).alias("is_exact_dup"))
    nd = near_duplicate_clusters(
        corpus, cfg, near_n, near_threshold, doc_col, content_col
    ).filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id", F.lit(True).alias("is_near_dup")
    )

    base = corpus.select(
        F.col(doc_col).alias("doc_id"),
        pred_lang_col(t).alias("pred_lang"),
        F.round(quality, 6).alias("quality"),
    )
    langs_arr = F.array(*[F.lit(x) for x in langs])
    reason = (
        F.when(~F.array_contains(langs_arr, F.col("pred_lang")), F.lit("lang"))
        .when(F.col("quality") < F.lit(float(quality_min)), F.lit("quality"))
    )
    joined = base.join(F.broadcast(ex), "doc_id", "left")
    if max_top_bigram_frac is not None:
        from invertedfiles_jl_spark.functions.text import repetition_stats

        rep = repetition_stats(corpus, cfg, doc_col, content_col).select(
            "doc_id", "top_bigram_frac")
        joined = joined.join(rep, "doc_id", "left")
        reason = reason.when(
            F.coalesce(F.col("top_bigram_frac"), F.lit(0.0))
            > F.lit(float(max_top_bigram_frac)), F.lit("repetition"))
    reason = (
        reason
        .when(F.coalesce(F.col("is_exact_dup"), F.lit(False)), F.lit("exact_dup"))
        .when(F.coalesce(F.col("is_near_dup"), F.lit(False)), F.lit("near_dup"))
        .otherwise(F.lit("ok"))
    )
    return (
        joined.join(F.broadcast(nd), "doc_id", "left")
        .select("doc_id", (reason == "ok").alias("keep"),
                reason.alias("reason"))
    )
