"""Deterministic sampling/splitting (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedfiles_jl_spark.operators.sampling import (
    HASH_SPACE,
    hash_split,
    stratified_sample,
    temperature_sample,
)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang")


def test_split_deterministic_and_total(docs):
    a = {r.doc_id: r.split for r in hash_split(docs, WEIGHTS).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, WEIGHTS).collect()}
    assert a == b and len(a) == docs.count()
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    # 500 docs: binomial(500, .8) is within ±6 sigma of these bounds
    assert counts["train"] > 330 and counts["val"] > 10 and counts["test"] > 10


def test_split_append_stable(docs):
    """Splitting a SUBSET assigns each doc identically — appends never
    reassign (the property randomSplit lacks)."""
    full = {r.doc_id: r.split for r in hash_split(docs, WEIGHTS).collect()}
    half = {r.doc_id: r.split
            for r in hash_split(docs.filter("doc_id % 2 = 0"),
                                WEIGHTS).collect()}
    assert half == {d: s for d, s in full.items() if d % 2 == 0}


def test_split_salt_independence(docs):
    a = {r.doc_id: r.split for r in hash_split(docs, WEIGHTS).collect()}
    b = {r.doc_id: r.split
         for r in hash_split(docs, WEIGHTS, salt="v2").collect()}
    assert a != b  # a re-salt is a fresh assignment


def test_stratified_rates_and_subset(docs):
    kept = stratified_sample(docs, {"en": 0.3, "zh": 1.0}, "lang",
                             default=0.5)
    rows = kept.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    total = {r.lang: r.asDict()["count"]
             for r in docs.groupBy("lang").count().collect()}
    assert by_lang["zh"] == {
        r.doc_id for r in docs.filter("lang = 'zh'").collect()}
    assert 0.1 < len(by_lang.get("en", ())) / total["en"] < 0.5
    # deterministic: same call, same survivors
    again = {r.doc_id for r in stratified_sample(
        docs, {"en": 0.3, "zh": 1.0}, "lang", default=0.5).collect()}
    assert again == {r.doc_id for r in rows}


def test_sampling_plans_are_map_only(docs):
    """No Exchange: split/sample must fuse into the scan."""
    for df in (hash_split(docs, WEIGHTS),
               stratified_sample(docs, {"en": 0.3}, "lang", default=0.5)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_temperature_sample_rates(docs):
    """Smallest stratum keeps everything; realized keep-rates track
    (c_min/c)^(1-1/T); T=1 is the identity; deterministic."""
    total = {r["lang"]: r["count"]
             for r in docs.groupBy("lang").count().collect()}
    cmin = min(total.values())
    smallest = min(total, key=total.get)
    kept = temperature_sample(docs, "lang", temperature=2.0).collect()
    by_lang: dict = {}
    for r in kept:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert by_lang[smallest] == {
        r["doc_id"] for r in docs.filter(F.col("lang") == smallest).collect()}
    for lang, c in total.items():
        rate = (cmin / c) ** 0.5
        realized = len(by_lang.get(lang, ())) / c
        assert abs(realized - rate) < 0.15, (lang, realized, rate)
    # T=1 keeps every row
    assert temperature_sample(docs, "lang", temperature=1.0).count() \
        == docs.count()
    # deterministic re-run
    again = {r["doc_id"]
             for r in temperature_sample(docs, "lang", temperature=2.0).collect()}
    assert again == {r["doc_id"] for r in kept}


def test_temperature_monotone_in_t(docs):
    """Higher temperature downsamples large strata harder, and with the
    same salt the bucket order is shared — so the largest stratum's T=4
    survivor set must be a STRICT subset of its T=2 survivor set."""
    total = {r["lang"]: r["count"]
             for r in docs.groupBy("lang").count().collect()}
    largest = max(total, key=total.get)
    t2 = {r["doc_id"] for r in temperature_sample(
        docs, "lang", temperature=2.0).collect() if r["lang"] == largest}
    t4 = {r["doc_id"] for r in temperature_sample(
        docs, "lang", temperature=4.0).collect() if r["lang"] == largest}
    assert t4 and t4 < t2


def test_threshold_edges(spark):
    """All-weight-on-one split assigns everything to it; weights are
    normalized (2:1:1 == 0.5:0.25:0.25)."""
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    only = hash_split(df, {"train": 1.0}).select("split").distinct().collect()
    assert [r.split for r in only] == ["train"]
    a = {r.doc_id: r.split
         for r in hash_split(df, {"a": 2, "b": 1, "c": 1}).collect()}
    b = {r.doc_id: r.split
         for r in hash_split(df, {"a": 0.5, "b": 0.25, "c": 0.25}).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# deterministic training-order shuffle
# ---------------------------------------------------------------------------


def test_shuffle_order_is_a_permutation(documents, spark):
    from invertedfiles_jl_spark.operators.sampling import shuffle_order

    got = shuffle_order(documents.select("doc_id"), n_shards=8).collect()
    n = documents.count()
    assert len(got) == n
    assert len({r["doc_id"] for r in got}) == n
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard


def test_shuffle_order_deterministic_and_salt_sensitive(documents, spark):
    from invertedfiles_jl_spark.operators.sampling import shuffle_order

    docs = documents.select("doc_id")
    a = {(r["doc_id"]): (r["shard"], r["pos"])
         for r in shuffle_order(docs, n_shards=8).collect()}
    b = {(r["doc_id"]): (r["shard"], r["pos"])
         for r in shuffle_order(docs, n_shards=8).collect()}
    assert a == b, "same salt must reproduce bit-for-bit"
    c = {(r["doc_id"]): (r["shard"], r["pos"])
         for r in shuffle_order(docs, n_shards=8, salt="epoch2").collect()}
    assert a != c, "a new salt must give an independent permutation"


def test_shuffle_order_breaks_source_order(documents, spark):
    """Adjacent doc_ids should rarely be adjacent in the shuffled order —
    the shuffle must actually decorrelate the input sequence."""
    from invertedfiles_jl_spark.operators.sampling import shuffle_order

    got = sorted(
        ((r["shard"], r["pos"]), r["doc_id"])
        for r in shuffle_order(documents.select("doc_id"), n_shards=1).collect())
    order = [d for _, d in got]
    adjacent = sum(1 for a, b in zip(order, order[1:]) if abs(a - b) == 1)
    assert adjacent < len(order) * 0.05
