"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

North-rule input shape (repo, path, commit, lang, content) with a 5000-term
vocabulary under Zipf-ish frequencies — guarantees hot-term skew for salting
and realistic posting-list selectivity (the driver's ``documents`` table has
a 31-term vocabulary where every query matches every doc, which makes query
benchmarks degenerate).

Generation is DISTRIBUTED and seed-free-deterministic: token t of doc d is a
pure function of (d, t) via xxhash64 → uniform u ∈ [0,1) → Zipf rank ≈ V^u
(inverse-CDF of p(r) ∝ 1/r).  No driver-side data, no RNG state — the same
(n_docs) always yields byte-identical content, on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 5000
LANGS = ["python", "java", "go", "js", "rust"]


def synth_corpus(spark: SparkSession, n_docs: int) -> DataFrame:
    """(doc_id, repo, path, commit, lang, content) — 20-400 tokens per doc,
    Zipf(V=5000) token ranks, all derived from doc_id."""
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    n_tok = (F.pmod(F.xxhash64(F.col("doc_id"), F.lit("len")), F.lit(381)) + 20)
    # token i: u = hash(doc_id, i)/2^20 scaled; rank = floor(V^u) ∈ [1, V]
    tok_expr = (
        "transform(sequence(1, n_tok), i -> "
        f"concat('tk', cast(pow({VOCAB_SIZE}.0, "
        "(pmod(xxhash64(doc_id, i), 1048576) / 1048576.0)) as int)))"
    )
    lang = F.element_at(
        F.array(*[F.lit(l) for l in LANGS]),
        (F.pmod(F.xxhash64(F.col("doc_id"), F.lit("lang")), F.lit(len(LANGS))) + 1).cast("int"),
    )
    repo = F.concat(F.lit("org"), (F.col("doc_id") % 7).cast("string"),
                    F.lit("/repo"), (F.col("doc_id") % 97).cast("string"))
    path = F.concat(F.lit("src/mod"), (F.col("doc_id") % 53).cast("string"),
                    F.lit("/file"), F.col("doc_id").cast("string"), F.lit(".txt"))
    return (
        docs.withColumn("n_tok", n_tok)
        .withColumn("content", F.concat_ws(" ", F.expr(tok_expr)))
        .select(
            "doc_id",
            repo.alias("repo"),
            path.alias("path"),
            F.substring(F.sha2(F.concat(repo, F.lit("/"), path).cast("binary"), 256), 1, 40).alias("commit"),
            lang.alias("lang"),
            "content",
        )
    )


def synth_queries(spark: SparkSession, n_queries: int, seed_terms: int = VOCAB_SIZE) -> DataFrame:
    """n deterministic queries mixing hot (low-rank) and rare terms: query q
    has 2-5 terms with ranks spread across the Zipf range."""
    q = spark.range(1, n_queries + 1).select(F.col("id").alias("query_id"))
    expr = (
        "concat_ws(' ', transform(sequence(1, cast(2 + pmod(query_id, 4) as int)), j -> "
        f"concat('tk', cast(1 + pmod(xxhash64(query_id, j), "
        f"CASE WHEN j % 2 = 0 THEN 50 ELSE {seed_terms} END) as int))))"
    )
    return q.withColumn("content", F.expr(expr))
