"""Deduplication operators for large-scale training-data pipelines.

No analog exists in the reference (it is an index library); these are the
engine's training-data extensions, built on the same tokenize/explode/agg
machinery.  Every operator is a declarative DataFrame plan (JVM-side
expressions only — md5/ascii/floor exist identically in DuckDB, which keeps
the driver oracles honest).

Scale notes (100 TB): everything is shuffle-by-key with map-side partial
aggregation; candidate generation is always hash-bucketed (sha/band/cluster)
so the pairwise verification join touches only same-bucket pairs, never the
n² cross product.  MinHash signatures are 8 independent min-aggregations in
ONE groupBy pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.functions.tokenize import tokens_sql

# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------


def shingles_sql(content_sql: str, cfg: IndexConfig, n: int = 3) -> str:
    """Spark-SQL expr: array of n-gram shingles (space-joined token runs);
    a doc with fewer than n tokens yields its whole token string."""
    t = tokens_sql(content_sql, cfg)
    return (
        f"CASE WHEN size({t}) >= {n} THEN "
        f"transform(sequence(0, size({t}) - {n}), i -> concat_ws(' ', slice({t}, i+1, {n}))) "
        f"ELSE array(concat_ws(' ', {t})) END"
    )


def duckdb_shingles_sql(content_sql: str, cfg: IndexConfig, n: int = 3) -> str:
    from invertedfiles_jl_spark.functions.tokenize import duckdb_tokens_sql

    t = duckdb_tokens_sql(content_sql, cfg)
    return (
        f"CASE WHEN len({t}) >= {n} THEN "
        f"list_transform(range(len({t}) - {n} + 1), i -> array_to_string(list_slice({t}, i+1, i+{n}), ' ')) "
        f"ELSE [array_to_string({t}, ' ')] END"
    )


def doc_shingles(df: DataFrame, cfg: IndexConfig, n: int = 3,
                 doc_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """(doc_id, shingle) distinct."""
    return df.select(
        F.col(doc_col).alias("doc_id"),
        F.explode(F.expr(shingles_sql(content_col, cfg, n))).alias("shingle"),
    ).distinct()


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, doc_col: str = "doc_id",
                     content_col: str = "content") -> DataFrame:
    """Hash-groupBy exact dedup: (doc_id, canonical_id, group_size) for every
    doc whose content sha256 collides with another's; canonical = min doc_id."""
    h = df.select(F.col(doc_col).alias("doc_id"),
                  F.sha2(F.col(content_col).cast("binary"), 256).alias("h"))
    g = h.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    ).filter(F.col("group_size") > 1)
    return h.join(g, "h").select("doc_id", "canonical_id", "group_size")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

N_HASHES = 8
BAND_ROWS = 2  # 4 bands of 2 rows


def minhash_signatures(sh: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, mh0..mh{H-1}) — minhash_h = MIN(md5(shingle || '#' || h)).

    Lexicographic min over md5 hex IS a uniform minhash (hex of a uniform
    128-bit value); md5 is identical in Spark and DuckDB so oracles align.
    One groupBy computes all H mins (no H-fold explode).
    """
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{h}")))).alias(f"mh{h}")
        for h in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_bands(sigs: DataFrame, n_hashes: int = N_HASHES,
              rows_per_band: int = BAND_ROWS) -> DataFrame:
    """(doc_id, band, sig) — band signature = md5 of its rows' concatenation."""
    bands = []
    for b in range(n_hashes // rows_per_band):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(F.struct(F.lit(b).alias("band"), F.md5(F.concat(*cols)).alias("sig")))
    return sigs.select("doc_id", F.explode(F.array(*bands)).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing ≥1 band bucket."""
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def near_duplicates_minhash(df: DataFrame, cfg: IndexConfig | None = None,
                            n: int = 3, threshold: float = 0.5,
                            doc_col: str = "doc_id",
                            content_col: str = "content") -> DataFrame:
    """MinHash→LSH→verify: (doc_a, doc_b, jaccard) for candidate pairs whose
    EXACT shingle-set Jaccard ≥ threshold.  Verification joins only
    LSH-bucketed pairs."""
    cfg = cfg or IndexConfig()
    sh = doc_shingles(df, cfg, n, doc_col, content_col)
    cand = lsh_candidate_pairs(lsh_bands(minhash_signatures(sh)))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("isize"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sa")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sb")), "doc_b")
        .withColumn("jaccard", F.col("isize") / (F.col("sa") + F.col("sb") - F.col("isize")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """(doc_id, label) connected components of an undirected edge list
    (doc_a, doc_b); label = component-min doc_id.  Min-label propagation:
    each round joins labels to the symmetric edge list, takes the min
    neighbor label per node, and keeps the smaller of own/neighbor —
    exact after ``diameter`` rounds.  Near-dup components are cliquish
    (members collide in most LSH bands with most other members), so the
    diameter — the round count — is small; each round is one shuffle keyed
    on doc_id over component nodes only.  Lineage is cut per round with
    ``localCheckpoint`` (iterative plans otherwise nest ``max_iter`` deep).
    At web scale with adversarial long-chain graphs the alternating
    large-star/small-star transform bounds rounds by log(n); propagation
    is the simpler exact choice for dup graphs."""
    # materialize the edge list ONCE: every round joins against it, and
    # without the checkpoint each round would re-execute the upstream
    # pair-generation pipeline (for near-dup edges that is the whole
    # MinHash+LSH+verify job)
    sym = edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")) \
        .union(edges.select(F.col("doc_b"), F.col("doc_a"))).localCheckpoint()
    labels = sym.select(F.col("src").alias("doc_id")).distinct() \
        .withColumn("label", F.col("doc_id")).localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            sym.join(labels.select(F.col("doc_id").alias("src"), "label"), "src")
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new = (
            labels.withColumnRenamed("label", "old")
            .join(nbr, "doc_id", "left")
            .select("doc_id", "old",
                    F.least("old", F.coalesce("nbr_label", "old")).alias("label"))
            .localCheckpoint()
        )
        changed = new.filter(F.col("label") != F.col("old")).count()
        labels = new.select("doc_id", "label")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds max_iter (raise it, or switch to a "
        "star-contraction variant for adversarial chain graphs)")


def near_duplicate_clusters(df: DataFrame, cfg: IndexConfig | None = None,
                            n: int = 3, threshold: float = 0.5,
                            doc_col: str = "doc_id",
                            content_col: str = "content") -> DataFrame:
    """(doc_id, cluster_id, cluster_size) — transitive closure of the
    verified MinHash near-dup pairs: the dedup DECISION step.  Keeping
    ``cluster_id`` (= min doc_id of the component) per member is exactly
    the keep-one-per-cluster policy: keep rows where
    ``doc_id = cluster_id``, drop the rest.  Only docs in ≥2-member
    components appear (singletons need no decision)."""
    pairs = near_duplicates_minhash(df, cfg, n, threshold, doc_col, content_col)
    labels = connected_components(pairs.select("doc_a", "doc_b"))
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "label").select(
        "doc_id", F.col("label").alias("cluster_id"), "cluster_size")


def ngram_set_duplicates(df: DataFrame, cfg: IndexConfig | None = None, n: int = 3,
                         doc_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """Exact dedup on the n-gram shingle SET fingerprint (order-insensitive
    near-dup: docs with identical shingle sets group together).
    Fingerprint = md5 of the sorted distinct shingle list."""
    cfg = cfg or IndexConfig()
    sh = doc_shingles(df, cfg, n, doc_col, content_col)
    fp = sh.groupBy("doc_id").agg(
        F.md5(F.concat_ws("\x01", F.sort_array(F.collect_list("shingle")))).alias("fp")
    )
    g = fp.groupBy("fp").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    ).filter(F.col("group_size") > 1)
    return fp.join(g, "fp").select("doc_id", "canonical_id", "group_size")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def _bit_sql(b: int, hash_col: str = "h") -> str:
    """SQL (valid in BOTH Spark and DuckDB) extracting bit ``b`` (0 = LSB of
    nibble 0) of an md5 hex string: nibble value from the hex char via
    ascii(), then shift/mask with floor division."""
    c = b // 4 + 1          # 1-based hex char index
    shift = 3 - (b % 4)     # bit within the nibble, MSB-first
    nib = (
        f"(CASE WHEN ascii(substr({hash_col}, {c}, 1)) >= 97 "
        f"THEN ascii(substr({hash_col}, {c}, 1)) - 87 "
        f"ELSE ascii(substr({hash_col}, {c}, 1)) - 48 END)"
    )
    return f"(CAST(floor({nib} / {2 ** shift}) AS INTEGER) % 2)"


def simhash_bit_sums_sql(bits: int = SIMHASH_BITS) -> list[tuple[str, str]]:
    """Per-bit tf-weighted contribution sums — (expr, alias) pairs whose expr
    string is valid in BOTH Spark SQL and DuckDB."""
    return [
        (f"sum(CASE WHEN {_bit_sql(b)} = 1 THEN tf ELSE -tf END)", f"s{b}")
        for b in range(bits)
    ]


def simhash_combine_sql(bits: int = SIMHASH_BITS) -> str:
    return " + ".join(f"(CASE WHEN s{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(bits))


def simhash(df: DataFrame, cfg: IndexConfig | None = None, bits: int = SIMHASH_BITS,
            doc_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """(doc_id, simhash) — tf-weighted {bits}-bit SimHash over md5 term
    hashes.  Near-dups share most bits; exact-similar docs collide."""
    cfg = cfg or IndexConfig()
    from invertedfiles_jl_spark.functions.tokenize import exploded_terms

    tf = exploded_terms(df, "doc_id", doc_col, content_col, cfg) \
        .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.withColumn("h", F.md5(F.col("term")))
    sums = tf.groupBy("doc_id").agg(
        *[F.expr(e).alias(a) for e, a in simhash_bit_sums_sql(bits)]
    )
    return sums.select(
        "doc_id", F.expr(simhash_combine_sql(bits)).cast("long").alias("simhash")
    )


# ---------------------------------------------------------------------------
# benchmark contamination
# ---------------------------------------------------------------------------


def benchmark_contamination(corpus: DataFrame, benchmark: DataFrame,
                            cfg: IndexConfig | None = None, n: int = 3,
                            rate_round: int = 6,
                            doc_col: str = "doc_id",
                            content_col: str = "content",
                            broadcast_benchmark: bool = True) -> DataFrame:
    """Training-data contamination check: per corpus doc, the fraction of
    its distinct ``n``-gram shingles that appear anywhere in a benchmark
    (eval-set) document.

    Returns (doc_id, n_shingles, n_hit, rate) with
    rate = round(n_hit / n_shingles, ``rate_round``).  A doc whose every
    shingle occurs in the benchmark (rate 1.0) is a leak; the standard
    pipeline policy filters on a rate threshold before training.

    Plan shape: the benchmark shingle set is DISTINCT'd then (by default)
    broadcast — eval benchmarks are KBs-to-MBs against a 100-TB corpus, so
    the contamination probe is a map-side left-semi join: one corpus scan,
    shingling in codegen, no corpus-side shuffle beyond the per-doc count
    agg (partial+final, keyed on doc_id which is already the scan order).
    Pass ``broadcast_benchmark=False`` for an unusually large benchmark and
    AQE plans the join from runtime sizes instead."""
    cfg = cfg or IndexConfig()
    d = doc_shingles(corpus, cfg, n, doc_col, content_col)
    b = doc_shingles(benchmark, cfg, n, doc_col, content_col) \
        .select("shingle").distinct()
    if broadcast_benchmark:
        b = F.broadcast(b)
    hits = d.join(b, "shingle", "left_semi").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hit"))
    totals = d.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"))
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        F.round(
            F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_shingles"),
            rate_round,
        ).alias("rate"),
    )
