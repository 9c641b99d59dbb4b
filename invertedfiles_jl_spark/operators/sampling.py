"""Deterministic sampling and dataset splitting for training-data pipelines.

No reference analog (the reference is an index library); these are the
curation primitives every corpus pipeline needs in front of the index:
content-independent train/val/test assignment and per-stratum downsampling.

Design constraints, in order:

1. **Deterministic and engine-portable.**  The assignment hash is
   ``md5(id ':' salt)`` truncated to 24 bits — md5 is bit-identical in
   Spark and DuckDB (the same trick the dedup/simhash oracles rely on), so
   the driver oracle reproduces every assignment exactly.  No RNG, no
   ``TABLESAMPLE`` (both are partitioning- and engine-dependent).
2. **Stable under corpus growth.**  A doc's split/keep decision depends
   only on its id and the salt — re-running over an APPENDED corpus never
   reassigns an old doc (the property monotonic training pipelines need;
   Spark's ``randomSplit`` has neither this nor cross-run stability).
3. **Map-only at any scale.**  Pure column expressions inside whole-stage
   codegen: no shuffle, no UDF, no driver data.  At 100 TB a split is a
   free projection fused into whatever scan follows it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bucket space: first 6 md5 hex chars = 24 bits (portable via conv /
#: '0x' cast; 16M buckets keeps rate granularity at ~6e-8)
HASH_SPACE = 16 ** 6


def split_bucket_sql(id_sql: str, salt: str) -> str:
    """Spark-SQL expr: uniform bucket in [0, HASH_SPACE) from (id, salt)."""
    return (
        f"CAST(conv(substr(md5(concat(CAST({id_sql} AS STRING), ':', "
        f"'{salt}')), 1, 6), 16, 10) AS BIGINT)"
    )


def duckdb_split_bucket_sql(id_sql: str, salt: str) -> str:
    """The identical bucket in DuckDB (no ``conv``; hex-literal cast)."""
    return (
        f"CAST(concat('0x', substr(md5(concat(CAST({id_sql} AS VARCHAR), "
        f"':', '{salt}')), 1, 6)) AS BIGINT)"
    )


def _thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split weights must sum to > 0")
    out, cum = [], 0.0
    for name, w in weights.items():
        cum += w / total
        out.append((name, int(cum * HASH_SPACE)))
    # the last split absorbs float rounding: its threshold IS the space
    out[-1] = (out[-1][0], HASH_SPACE)
    return out


def hash_split(df: DataFrame, weights: dict[str, float],
               id_col: str = "doc_id", salt: str = "split",
               out_col: str = "split") -> DataFrame:
    """Assign every row to a named split by hash-bucket thresholding —
    ``{"train": 0.98, "val": 0.01, "test": 0.01}`` style.  Weights are
    normalized; cut points are cumulative over dict order.  Changing the
    salt produces an independent re-split; appending rows never moves an
    existing one."""
    bucket = F.expr(split_bucket_sql(id_col, salt))
    names_thresholds = _thresholds(weights)
    expr = None
    for name, t in names_thresholds[:-1]:
        cond = bucket < t
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (expr.otherwise(F.lit(names_thresholds[-1][0]))
            if expr is not None else F.lit(names_thresholds[-1][0]))
    return df.withColumn(out_col, expr)


def temperature_sample(df: DataFrame, strata_col: str,
                       temperature: float = 2.0, id_col: str = "doc_id",
                       salt: str = "temp") -> DataFrame:
    """Temperature-based stratum rebalancing — the multilingual data-mixing
    primitive (sampling probability ∝ p^(1/T) instead of the natural p, as
    in multilingual-pretraining practice): downsample each stratum with

        rate(s) = (c_min / c_s) ^ (1 - 1/T)

    so post-sample counts are proportional to c_s^(1/T).  The SMALLEST
    stratum keeps everything (rate 1); T=1 is the identity; T→∞ flattens
    to uniform counts.  Keep decisions reuse the deterministic md5 bucket —
    append-stable per stratum-count snapshot, reproducible in DuckDB.

    Everything is declarative: stratum counts are one tiny aggregate
    (#strata rows) broadcast back into a map-side filter — no driver-side
    math, so Spark and the oracle compute the rate with the same SQL
    arithmetic.  The rate is quantized (round 6) before thresholding so a
    last-ULP ``pow`` difference between engines cannot move a bucket
    boundary.  At 100 TB: one partial+final count agg + one broadcast join
    — the filter itself stays map-only."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    expo = 1.0 - 1.0 / float(temperature)
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_c"))
    cmin = counts.agg(F.min("_c").alias("_cmin"))
    thr = counts.crossJoin(F.broadcast(cmin)).select(
        strata_col,
        F.floor(F.round(
            F.pow(F.col("_cmin").cast("double") / F.col("_c").cast("double"),
                  F.lit(expo)), 6) * HASH_SPACE).alias("_thr"),
    )
    bucket = F.expr(split_bucket_sql(id_col, salt))
    return (df.join(F.broadcast(thr), strata_col)
            .filter(bucket < F.col("_thr")).drop("_thr"))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str, default: float = 0.0,
                      id_col: str = "doc_id",
                      salt: str = "sample") -> DataFrame:
    """Keep each row with its STRATUM's probability, deterministically:
    row survives iff ``bucket(id, salt) < frac(stratum) * HASH_SPACE``.
    The workhorse of language/source rebalancing (e.g. downsample ``en``
    to 30%, keep the rest) — map-only, reproducible, append-stable.
    Strata missing from ``fractions`` use ``default`` (0 = drop)."""
    bucket = F.expr(split_bucket_sql(id_col, salt))
    thr = None
    for name, frac in fractions.items():
        t = F.lit(int(frac * HASH_SPACE))
        cond = F.col(strata_col) == name
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = (thr.otherwise(F.lit(int(default * HASH_SPACE)))
           if thr is not None else F.lit(int(default * HASH_SPACE)))
    return df.filter(bucket < thr)


def shuffle_order(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                  salt: str = "shuffle") -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    pseudo-random position — (shard, pos) such that reading shards in
    order, each sorted by pos, is a uniformly-shuffled pass over the corpus
    that any engine reproduces bit-for-bit (the md5 bucket trick shared
    with :func:`hash_split`; change ``salt`` for an independent epoch
    permutation).

    Returns the input plus (shard long, pos long).  Scale shape: this IS
    the classic materialize-training-shards job — one exchange keyed on the
    shard plus a per-shard sort, bounded by corpus/n_shards per task; the
    hash order breaks source locality (adjacent docs land in different
    shards) which is the point.  Tie-break inside a bucket is the id, so
    duplicate buckets (16M space) stay deterministic."""
    bucket = F.expr(split_bucket_sql(id_col, salt))
    from pyspark.sql import Window

    out = df.withColumn("_b", bucket).withColumn(
        "shard", (F.col("_b") % n_shards).cast("long"))
    w = Window.partitionBy("shard").orderBy(
        F.col("_b").asc(), F.col(id_col).asc())
    return (out.withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("_b"))
