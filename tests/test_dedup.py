"""Dedup operators vs independent python oracles on the documents fixture."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from invertedfiles_jl_spark.config import IndexConfig
from invertedfiles_jl_spark.operators.dedup import (
    connected_components,
    exact_duplicates,
    near_duplicate_clusters,
    near_duplicates_minhash,
    ngram_set_duplicates,
    simhash,
)

CFG = IndexConfig()


def _shingle_set(text: str, n: int = 3) -> set[str]:
    toks = [t.lower() for t in text.split() if t]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def corpus_with_dups(documents):
    """documents + exact copies of docs 0-4 at doc_id 10000+."""
    base = documents.select("doc_id", F.col("text").alias("content"))
    dups = (
        base.filter(F.col("doc_id") < 5)
        .select((F.col("doc_id") + 10000).alias("doc_id"), "content")
    )
    return base.unionByName(dups)


def test_exact_duplicates(corpus_with_dups):
    rows = exact_duplicates(corpus_with_dups).collect()
    got = {(r["doc_id"], r["canonical_id"], r["group_size"]) for r in rows}
    expect = set()
    for d in range(5):
        expect.add((d, d, 2))
        expect.add((d + 10000, d, 2))
    assert got == expect


def test_ngram_set_duplicates_finds_exact_copies(corpus_with_dups):
    rows = ngram_set_duplicates(corpus_with_dups, CFG).collect()
    pairs = {(r["doc_id"], r["canonical_id"]) for r in rows}
    for d in range(5):
        assert (d + 10000, d) in pairs


def test_minhash_near_duplicates_verified(documents, docs_pandas):
    base = documents.select("doc_id", F.col("text").alias("content"))
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in near_duplicates_minhash(base, CFG, threshold=0.5).collect()}
    texts = dict(zip(docs_pandas["doc_id"], docs_pandas["text"]))
    sets = {d: _shingle_set(t) for d, t in texts.items()}
    # 1) every reported pair's jaccard is exact and ≥ threshold
    for (a, b), j in got.items():
        inter = len(sets[a] & sets[b])
        gold = inter / (len(sets[a]) + len(sets[b]) - inter)
        assert abs(gold - j) < 1e-9
        assert gold >= 0.5
    # 2) every VERY similar pair (j ≥ 0.9) is found — at 4 bands × 2 rows the
    # LSH detection probability is 1-(1-s²)^4 ≈ 0.9987, and with fixed md5
    # hash functions detection is deterministic; assert none are missed
    ids = sorted(sets)
    high = [
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= 0.9
    ]
    assert high, "fixture should contain near-dup pairs (the 'dup' docs)"
    for p in high:
        assert p in got, f"missed high-sim pair {p}"


def test_simhash_matches_python_oracle(documents, docs_pandas):
    base = documents.select("doc_id", F.col("text").alias("content")).filter(
        F.col("doc_id") < 50
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash(base, CFG).collect()}

    def py_simhash(text: str, bits: int = 16) -> int:
        tf = Counter(t.lower() for t in text.split() if t)
        sums = [0] * bits
        for term, cnt in tf.items():
            h = hashlib.md5(term.encode()).hexdigest()
            for b in range(bits):
                nib = int(h[b // 4], 16)
                bit = (nib >> (3 - b % 4)) & 1
                sums[b] += cnt if bit else -cnt
        return sum(2 ** b for b in range(bits) if sums[b] > 0)

    texts = dict(zip(docs_pandas["doc_id"], docs_pandas["text"]))
    for d, s in got.items():
        assert s == py_simhash(texts[d]), f"doc {d}"


def test_simhash_identical_docs_collide(corpus_with_dups):
    got = {r["doc_id"]: r["simhash"]
           for r in simhash(corpus_with_dups.filter(
               (F.col("doc_id") < 5) | (F.col("doc_id") >= 10000)), CFG).collect()}
    for d in range(5):
        assert got[d] == got[d + 10000]


def test_connected_components_chain_and_islands(spark):
    """Chain 1-2-3-4 collapses to one component labeled by its min; the
    isolated pair keeps its own label; singletons never appear."""
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (10, 11)], "doc_a long, doc_b long")
    got = {r.doc_id: r.label for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_near_dup_clusters_transitive_closure(documents, docs_pandas):
    """Cluster labels must equal the transitive closure of the verified
    pair graph computed by a python union-find over the same pairs."""
    base = documents.select("doc_id", F.col("text").alias("content"))
    pairs = [(r.doc_a, r.doc_b) for r in
             near_duplicates_minhash(base, CFG, threshold=0.5).collect()]
    assert pairs, "fixture should contain near-dup pairs"
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for x in parent:
        want.setdefault(find(x), set()).add(x)
    got = {}
    for r in near_duplicate_clusters(base, CFG, threshold=0.5).collect():
        got.setdefault(r.cluster_id, set()).add(r.doc_id)
        assert r.cluster_size == len(want[find(r.cluster_id)])
    assert got == {min(m): m for m in want.values()}


# ---------------------------------------------------------------------------
# composed curation verdict
# ---------------------------------------------------------------------------


def test_curate_first_failing_gate(spark):
    """Each engineered doc fails exactly the gate the fixture targets, in
    the contract's fixed order (a non-English exact duplicate reports
    'lang', not 'exact_dup')."""
    from invertedfiles_jl_spark.operators.curation import curate

    clean = ("the alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo sierra "
             "tango uniform victor whiskey xray yankee zulu and of a is to "
             * 4)
    rich = ("the quick brown fox jumps over the lazy dog and then "
            "is of a to merge sort window table row value part hash "
            "batch scan line key slow fast spark agg " * 3)
    docs = [
        (0, clean),                                # clean → ok
        (1, "el la de los " * 40),                 # Spanish markers → lang
        (2, "the a of"),                           # 3 tokens → low quality
        (3, rich + " three"),                      # canonical of exact pair
        (4, rich + " three"),                      # exact dup of 3
        (5, "el la de los " * 40 + " cinco"),      # es near-dup of 1: lang fires FIRST
        (6, rich + " three six"),                  # near-dup of 3 (high shingle overlap)
    ]
    df = spark.createDataFrame(docs, "doc_id long, content string")
    got = {r["doc_id"]: (r["keep"], r["reason"])
           for r in curate(df, langs=("en",), quality_min=0.45,
                           near_threshold=0.5).collect()}
    assert len(got) == len(docs)
    assert got[0] == (True, "ok")
    assert got[1] == (False, "lang")
    assert got[2] == (False, "quality")
    assert got[3] == (True, "ok")            # keep-min canonical survives
    assert got[4] == (False, "exact_dup")
    assert got[5] == (False, "lang")         # lang gate fires before near_dup
    assert got[6] == (False, "near_dup")


def test_curate_covers_every_doc_once(documents, spark):
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.operators.curation import curate

    corpus = documents.select("doc_id", F.col("text").alias("content"))
    res = curate(corpus)
    assert res.count() == corpus.count()
    assert res.select("doc_id").distinct().count() == corpus.count()
    reasons = {r["reason"] for r in res.select("reason").distinct().collect()}
    assert reasons <= {"ok", "lang", "quality", "exact_dup", "near_dup"}


def test_curate_repetition_gate_order(spark):
    """The repetition gate fires between quality and the dedup gates: a
    degenerate repeated-bigram doc reports 'repetition'; the same doc
    failing lang reports 'lang' (order), and the gate is off by default."""
    from invertedfiles_jl_spark.operators.curation import curate

    loop = ("the code " * 60).strip()              # top bigram dominates
    clean = ("the alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo and "
             "of a is to " * 4)
    docs = [(0, clean), (1, loop), (2, "el la " * 60 + "de los")]
    df = spark.createDataFrame(docs, "doc_id long, content string")
    got = {r["doc_id"]: r["reason"]
           for r in curate(df, max_top_bigram_frac=0.3).collect()}
    assert got[0] == "ok"
    assert got[1] == "repetition"
    assert got[2] == "lang"                        # lang fires first
    off = {r["doc_id"]: r["reason"] for r in curate(df).collect()}
    assert off[1] == "ok"                          # gate off by default
