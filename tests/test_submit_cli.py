"""spark-submit entrypoint (submit_main.py) — the north rule's deploy
surface: build → shard → query must work end-to-end through the CLI, and
every query plan must return the same ranking.

Run here via main(argv) against the test SparkSession (spark-submit itself
owns the config in a real deploy; SparkSession.getOrCreate reuses ours).
"""

from __future__ import annotations

import pytest

import submit_main


@pytest.fixture(scope="module")
def corpus_path(documents, tmp_path_factory):
    from pyspark.sql import functions as F

    p = str(tmp_path_factory.mktemp("cli") / "corpus")
    documents.select("doc_id", F.col("text").alias("content")).write.mode(
        "overwrite").parquet(p)
    return p


@pytest.fixture(scope="module")
def index_path(spark, corpus_path, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli") / "index")
    rc = submit_main.main(["build", "--input", corpus_path, "--index", p])
    assert rc == 0
    return p


@pytest.fixture(scope="module")
def queries_path(spark, tmp_path_factory):
    from invertedfiles_jl_spark.sources.queries import queries_df

    p = str(tmp_path_factory.mktemp("cli") / "queries")
    queries_df(spark).write.mode("overwrite").parquet(p)
    return p


def _ranking(spark, path):
    rows = spark.read.parquet(path).collect()
    out = {}
    for r in rows:
        out.setdefault(r.query_id, []).append((r.rank, r.doc_id))
    return {q: sorted(v) for q, v in out.items()}


def test_cli_build_then_query_all_plans_agree(spark, index_path, queries_path,
                                              tmp_path):
    outs = {}
    for plan in ("wand", "relational", "sharded", "auto"):
        out = str(tmp_path / f"res_{plan}")
        rc = submit_main.main(["query", "--index", index_path,
                               "--queries", queries_path, "--output", out,
                               "--plan", plan, "--rank-round", "6"])
        assert rc == 0
        outs[plan] = _ranking(spark, out)
    assert outs["wand"] and set(outs["wand"]) == set(outs["relational"])
    assert outs["wand"] == outs["relational"] == outs["sharded"] == outs["auto"]


def test_cli_shard_layout_serves_batches(spark, index_path, queries_path,
                                         tmp_path):
    shards = str(tmp_path / "shards")
    rc = submit_main.main(["shard", "--index", index_path,
                           "--output", shards, "--n-shards", "4"])
    assert rc == 0
    out_served = str(tmp_path / "res_served")
    rc = submit_main.main(["query", "--index", index_path,
                           "--queries", queries_path, "--output", out_served,
                           "--plan", "sharded", "--shards", shards,
                           "--n-shards", "4", "--rank-round", "6"])
    assert rc == 0
    out_direct = str(tmp_path / "res_direct")
    rc = submit_main.main(["query", "--index", index_path,
                           "--queries", queries_path, "--output", out_direct,
                           "--plan", "wand", "--rank-round", "6"])
    assert rc == 0
    assert _ranking(spark, out_served) == _ranking(spark, out_direct)


def test_cli_binary_sharded_plan(spark, corpus_path, queries_path, tmp_path):
    """Binary index through the CLI: build → shard → query with
    --plan sharded (served layout) must match --plan relational."""
    idx = str(tmp_path / "binidx")
    rc = submit_main.main(["build", "--input", corpus_path, "--index", idx,
                           "--weighting", "binary"])
    assert rc == 0
    shards = str(tmp_path / "binshards")
    rc = submit_main.main(["shard", "--index", idx, "--output", shards,
                           "--n-shards", "4"])
    assert rc == 0
    out_served = str(tmp_path / "bin_served")
    rc = submit_main.main(["query", "--index", idx, "--queries", queries_path,
                           "--output", out_served, "--plan", "sharded",
                           "--shards", shards, "--n-shards", "4",
                           "--dist", "jaccard", "--rank-round", "9"])
    assert rc == 0
    out_rel = str(tmp_path / "bin_rel")
    rc = submit_main.main(["query", "--index", idx, "--queries", queries_path,
                           "--output", out_rel, "--plan", "relational",
                           "--dist", "jaccard", "--rank-round", "9"])
    assert rc == 0
    assert _ranking(spark, out_served) == _ranking(spark, out_rel)


def test_cli_serve_matches_batch(spark, index_path, corpus_path, queries_path,
                                 tmp_path):
    """`serve` drains the corpus as a file stream through the stateful
    top-k server and must land on the batch relational ranking (frozen
    stats come from the same index the batch plan queries)."""
    serve_out = str(tmp_path / "serve_out")
    rc = submit_main.main([
        "serve", "--index", index_path, "--queries", queries_path,
        "--stream-src", corpus_path, "--output", serve_out,
        "--checkpoint", str(tmp_path / "serve_ckpt"),
        "--k", "10", "--rank-round", "6",
    ])
    assert rc == 0
    batch_out = str(tmp_path / "res_rel")
    rc = submit_main.main([
        "query", "--index", index_path, "--queries", queries_path,
        "--output", batch_out, "--plan", "relational", "--rank-round", "6",
    ])
    assert rc == 0
    serve = {(r.query_id, r["rank"]): r.doc_id
             for r in spark.read.parquet(serve_out).collect()}
    batch = {(r.query_id, r["rank"]): r.doc_id
             for r in spark.read.parquet(batch_out).collect()}
    assert serve == batch


def test_cli_delete_matches_library(spark, index_path, corpus_path,
                                    queries_path, tmp_path):
    """`delete` writes a loadable index root whose query results equal the
    library's delete_documents over the same index."""
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.operators.maintenance import delete_documents
    from invertedfiles_jl_spark.operators.search import bm25_topk
    from invertedfiles_jl_spark.plans.pipeline import load_index
    from invertedfiles_jl_spark.sources.queries import queries_df

    dels_path = str(tmp_path / "dels")
    spark.read.parquet(corpus_path).filter(F.col("doc_id") % 7 == 3).select(
        "doc_id").write.mode("overwrite").parquet(dels_path)
    out_idx = str(tmp_path / "idx_deleted")
    rc = submit_main.main(["delete", "--index", index_path,
                           "--output", out_idx, "--delete-ids", dels_path])
    assert rc == 0
    res_out = str(tmp_path / "res_deleted")
    rc = submit_main.main(["query", "--index", out_idx, "--queries",
                           queries_path, "--output", res_out,
                           "--plan", "relational", "--rank-round", "6"])
    assert rc == 0
    got = _ranking(spark, res_out)
    lib = delete_documents(
        load_index(spark, index_path),
        spark.read.parquet(dels_path))
    want_rows = bm25_topk(lib, queries_df(spark), k=10, rank_round=6).collect()
    want = {}
    for r in want_rows:
        want.setdefault(r.query_id, []).append((r["rank"], r.doc_id))
    assert got == {q: sorted(v) for q, v in want.items()}


def test_cli_prune_drops_hot_terms(spark, index_path, tmp_path):
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.plans.pipeline import load_index

    out_idx = str(tmp_path / "idx_pruned")
    rc = submit_main.main(["prune", "--index", index_path,
                           "--output", out_idx, "--max-df-ratio", "0.5"])
    assert rc == 0
    idx = load_index(spark, index_path)
    pruned = load_index(spark, out_idx)
    cap = int(0.5 * idx.stats["n_docs"])
    hot_left = pruned.postings.join(
        idx.vocab.filter(F.col("df") > cap).select("term_id"),
        "term_id", "semi").count()
    assert hot_left == 0
    assert 0 < pruned.postings.count() < idx.postings.count()


def test_cli_positional_phrase(spark, corpus_path, tmp_path):
    """build-positional → phrase through the CLI equals the library path."""
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.operators.positional import (
        phrase_topk,
        positional_postings,
    )
    from invertedfiles_jl_spark.sources.queries import phrases_df

    pos_path = str(tmp_path / "positional")
    rc = submit_main.main(["build-positional", "--input", corpus_path,
                           "--output", pos_path])
    assert rc == 0
    phrases_path = str(tmp_path / "phrases")
    phrases_df(spark).write.mode("overwrite").parquet(phrases_path)
    out = str(tmp_path / "phrase_res")
    rc = submit_main.main(["phrase", "--positional", pos_path,
                           "--phrases", phrases_path, "--output", out])
    assert rc == 0
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    corpus = spark.read.parquet(corpus_path)
    want = sorted(map(tuple, phrase_topk(
        positional_postings(corpus), phrases_df(spark), k=10).collect()))
    assert got == want and len(got) > 0


def test_cli_qstring_matches_library(spark, index_path, corpus_path,
                                     documents, tmp_path):
    """build-positional → qstring through the CLI equals the library
    query_string_topk on the same index (slop + exact + boolean +
    metadata-qualifier mix)."""
    from invertedfiles_jl_spark.operators.positional import (
        positional_postings,
    )
    from invertedfiles_jl_spark.operators.querystring import (
        query_string_topk,
    )
    from invertedfiles_jl_spark.plans.pipeline import load_index
    from invertedfiles_jl_spark.sources.queries import qstring_df

    pos_path = str(tmp_path / "positional")
    rc = submit_main.main(["build-positional", "--input", corpus_path,
                           "--output", pos_path])
    assert rc == 0
    q_path = str(tmp_path / "qstrings")
    qstring_df(spark).write.mode("overwrite").parquet(q_path)
    meta = documents.select("doc_id", "lang", "source", "n_chars")
    meta_path = str(tmp_path / "meta")
    meta.write.mode("overwrite").parquet(meta_path)
    out = str(tmp_path / "qstring_res")
    rc = submit_main.main(["qstring", "--index", index_path,
                           "--positional", pos_path, "--queries", q_path,
                           "--meta", meta_path,
                           "--qualifier-fields", "lang,source,n_chars",
                           "--output", out, "--rank-round", "6"])
    assert rc == 0
    got = sorted((r.query_id, r.rank, r.doc_id)
                 for r in spark.read.parquet(out).collect())
    idx = load_index(spark, index_path)
    corpus = spark.read.parquet(corpus_path)
    want = sorted((r.query_id, r.rank, r.doc_id)
                  for r in query_string_topk(
                      idx, positional_postings(corpus), qstring_df(spark),
                      k=10, rank_round=6, meta=meta,
                      qualifier_fields=("lang", "source", "n_chars"),
                  ).collect())
    assert got == want and len(got) > 0


def test_cli_percolate_both_modes(spark, index_path, corpus_path,
                                  documents, tmp_path):
    """percolate through the CLI equals the library paths — term mode
    (conjunctive frozen-stats percolator) and --qstring mode (full
    mini-language with qualifiers against the docs' own columns)."""
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.operators.querystring import (
        query_string_percolate,
    )
    from invertedfiles_jl_spark.plans.pipeline import load_index
    from invertedfiles_jl_spark.sources.queries import qstring_df, queries_df
    from invertedfiles_jl_spark.streaming.serve import percolate

    docs = documents.select(
        "doc_id", F.col("text").alias("content"), "lang", "source",
        "n_chars")
    docs_path = str(tmp_path / "pdocs")
    docs.write.mode("overwrite").parquet(docs_path)
    idx = load_index(spark, index_path)

    q_path = str(tmp_path / "pterms")
    queries_df(spark).write.mode("overwrite").parquet(q_path)
    out = str(tmp_path / "perc_terms")
    rc = submit_main.main(["percolate", "--index", index_path,
                           "--queries", q_path, "--docs", docs_path,
                           "--output", out])
    assert rc == 0
    got = sorted((r.query_id, r.doc_id)
                 for r in spark.read.parquet(out).collect())
    want = sorted((r.query_id, r.doc_id)
                  for r in percolate(idx, queries_df(spark), docs,
                                     require_all=True).collect())
    assert got == want and len(got) > 0

    qs_path = str(tmp_path / "pqstrings")
    qstring_df(spark).write.mode("overwrite").parquet(qs_path)
    out2 = str(tmp_path / "perc_qs")
    rc = submit_main.main(["percolate", "--index", index_path,
                           "--queries", qs_path, "--docs", docs_path,
                           "--qstring",
                           "--qualifier-fields", "lang,source,n_chars",
                           "--output", out2])
    assert rc == 0
    got2 = sorted((r.query_id, r.doc_id)
                  for r in spark.read.parquet(out2).collect())
    want2 = sorted(
        (r.query_id, r.doc_id)
        for r in query_string_percolate(
            idx, qstring_df(spark), docs,
            qualifier_fields=("lang", "source", "n_chars")).collect())
    assert got2 == want2 and len(got2) > 0


def test_cli_proximity_and_snippet_modes(spark, corpus_path, tmp_path):
    """--mode proximity/snippet through the CLI equals the library paths."""
    from invertedfiles_jl_spark.operators.positional import (
        positional_postings,
        proximity_topk,
        snippet_topk,
    )
    from invertedfiles_jl_spark.sources.queries import phrases_df

    pos_path = str(tmp_path / "positional")
    assert submit_main.main(["build-positional", "--input", corpus_path,
                             "--output", pos_path]) == 0
    phrases_path = str(tmp_path / "phrases")
    phrases_df(spark).write.mode("overwrite").parquet(phrases_path)
    corpus = spark.read.parquet(corpus_path)
    pos = positional_postings(corpus)

    out = str(tmp_path / "prox_res")
    assert submit_main.main(["phrase", "--mode", "proximity",
                             "--positional", pos_path,
                             "--phrases", phrases_path,
                             "--max-span", "8", "--output", out]) == 0
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, proximity_topk(
        pos, phrases_df(spark), k=10, max_span=8).collect()))
    assert got == want and len(got) > 0

    out2 = str(tmp_path / "snip_res")
    assert submit_main.main(["phrase", "--mode", "snippet",
                             "--positional", pos_path,
                             "--phrases", phrases_path,
                             "--max-span", "8", "--corpus", corpus_path,
                             "--output", out2]) == 0
    got2 = sorted(map(tuple, spark.read.parquet(out2).collect()))
    want2 = sorted(map(tuple, snippet_topk(
        pos, phrases_df(spark), corpus, k=10, max_span=8).collect()))
    assert got2 == want2 and len(got2) > 0


def test_cli_split_and_profile(spark, corpus_path, tmp_path):
    from invertedfiles_jl_spark.operators.meta import corpus_profile
    from invertedfiles_jl_spark.operators.sampling import hash_split

    out = str(tmp_path / "split_res")
    assert submit_main.main(["split", "--input", corpus_path,
                             "--weights", "train=0.8,val=0.2",
                             "--output", out]) == 0
    corpus = spark.read.parquet(corpus_path)
    got = {r.doc_id: r.split for r in spark.read.parquet(out).collect()}
    want = {r.doc_id: r.split for r in hash_split(
        corpus, {"train": 0.8, "val": 0.2}).collect()}
    assert got == want and set(got.values()) == {"train", "val"}

    pout = str(tmp_path / "profile_res")
    assert submit_main.main(["profile", "--input", corpus_path,
                             "--output", pout]) == 0
    got_row = spark.read.parquet(pout).first()
    want_row = corpus_profile(corpus).first()
    assert got_row == want_row


def test_cli_pack_and_sample(spark, corpus_path, documents, tmp_path):
    from invertedfiles_jl_spark.operators.packing import pack_sequences
    from invertedfiles_jl_spark.operators.sampling import temperature_sample

    out = str(tmp_path / "pack_res")
    assert submit_main.main(["pack", "--input", corpus_path,
                             "--ctx", "128", "--output", out]) == 0
    corpus = spark.read.parquet(corpus_path)
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(tuple(r) for r in pack_sequences(corpus, ctx=128).collect())
    assert got == want and got

    sout = str(tmp_path / "sample_res")
    docs_path = str(tmp_path / "docs_lang")
    documents.select("doc_id", "lang").write.mode("overwrite").parquet(docs_path)
    assert submit_main.main(["sample", "--input", docs_path,
                             "--strata-col", "lang",
                             "--temperature", "2.0",
                             "--output", sout]) == 0
    got_ids = {r.doc_id for r in spark.read.parquet(sout).collect()}
    want_ids = {r.doc_id for r in temperature_sample(
        spark.read.parquet(docs_path), "lang", temperature=2.0).collect()}
    assert got_ids == want_ids and got_ids

    # exactly one of --temperature / --fractions is required
    with pytest.raises(SystemExit):
        submit_main.main(["sample", "--input", docs_path,
                          "--strata-col", "lang", "--output", sout])


def test_cli_synonyms_matches_library(spark, index_path, corpus_path,
                                      queries_path, tmp_path):
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.config import IndexConfig
    from invertedfiles_jl_spark.operators.build import build_index
    from invertedfiles_jl_spark.operators.search import synonym_bm25_topk
    from invertedfiles_jl_spark.sources.queries import queries_df, synonyms_df

    syn_path = str(tmp_path / "syn")
    synonyms_df(spark).write.mode("overwrite").parquet(syn_path)
    out = str(tmp_path / "res_syn")
    rc = submit_main.main(["query", "--index", index_path,
                           "--queries", queries_path, "--output", out,
                           "--plan", "relational", "--synonyms", syn_path,
                           "--rank-round", "6"])
    assert rc == 0
    got = _ranking(spark, out)
    corpus = spark.read.parquet(corpus_path)
    idx = build_index(corpus, IndexConfig(weighting="bm25"))
    want = {}
    for r in synonym_bm25_topk(idx, queries_df(spark), synonyms_df(spark),
                               k=10, rank_round=6).collect():
        want.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    assert got == {q: sorted(v) for q, v in want.items()} and got
    # guard: --synonyms outside the relational plan must refuse
    with pytest.raises(SystemExit):
        submit_main.main(["query", "--index", index_path,
                          "--queries", queries_path, "--output", out,
                          "--plan", "wand", "--synonyms", syn_path])


def test_cli_trigram_substring_and_rerank(spark, corpus_path, tmp_path,
                                          sf_dir):
    from invertedfiles_jl_spark.operators.rerank import mmr_rerank
    from invertedfiles_jl_spark.operators.trigram import (
        build_trigram_index,
        substring_search,
    )
    from invertedfiles_jl_spark.sources.queries import substrings_df
    from pyspark.sql import functions as F

    tri = str(tmp_path / "trigram")
    rc = submit_main.main(["build-trigram", "--input", corpus_path,
                           "--output", tri])
    assert rc == 0

    needles = str(tmp_path / "needles")
    substrings_df(spark).write.mode("overwrite").parquet(needles)
    out = str(tmp_path / "subs")
    rc = submit_main.main(["substring", "--trigram", tri,
                           "--corpus", corpus_path, "--needles", needles,
                           "--output", out])
    assert rc == 0
    got = {(r["query_id"], r["doc_id"]): r["n_occ"]
           for r in spark.read.parquet(out).collect()}
    corpus = spark.read.parquet(corpus_path)
    ti = build_trigram_index(corpus)
    want = {(r["query_id"], r["doc_id"]): r["n_occ"]
            for r in substring_search(ti, substrings_df(spark)).collect()}
    assert got == want and got

    emb_path = f"{sf_dir}/embeddings.parquet"
    emb = spark.read.parquet(emb_path)
    qp = str(tmp_path / "vq")
    emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb")).write.mode("overwrite").parquet(qp)
    rout = str(tmp_path / "rerank")
    rc = submit_main.main(["rerank", "--embeddings", emb_path,
                           "--queries", qp, "--output", rout,
                           "--k", "5", "--depth", "15", "--lam", "0.7"])
    assert rc == 0
    got_r = {(r["query_id"], r["rank"]): r["doc_id"]
             for r in spark.read.parquet(rout).collect()}
    vq = spark.read.parquet(qp)
    want_r = {(r["query_id"], r["rank"]): r["doc_id"]
              for r in mmr_rerank(emb, vq, k=5, depth=15, lam=0.7).collect()}
    assert got_r == want_r and got_r


def test_cli_curate_and_score(spark, corpus_path, tmp_path):
    from invertedfiles_jl_spark.functions.text import lm_perplexity
    from invertedfiles_jl_spark.operators.curation import curate

    out = str(tmp_path / "curate_res")
    assert submit_main.main(["curate", "--input", corpus_path,
                             "--output", out, "--langs", "en",
                             "--quality-min", "0.45"]) == 0
    corpus = spark.read.parquet(corpus_path)
    got = {r.doc_id: (r.keep, r.reason)
           for r in spark.read.parquet(out).collect()}
    want = {r.doc_id: (r.keep, r.reason) for r in curate(corpus).collect()}
    assert got == want

    sout = str(tmp_path / "lm_res")
    assert submit_main.main(["score", "--input", corpus_path,
                             "--output", sout, "--mode", "lm"]) == 0
    got_lm = {r.doc_id: r.ppl for r in spark.read.parquet(sout).collect()}
    want_lm = {r.doc_id: r.ppl for r in lm_perplexity(corpus).collect()}
    assert got_lm == want_lm


def test_cli_dense_methods(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.operators.ann import brute_force_topk, sq8_topk

    emb_path = f"{sf_dir}/embeddings.parquet"
    emb = spark.read.parquet(emb_path)
    qpath = str(tmp_path / "vq")
    emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb")).write.parquet(qpath)

    bout = str(tmp_path / "dense_brute")
    assert submit_main.main(["dense", "--embeddings", emb_path,
                             "--queries", qpath, "--output", bout,
                             "--method", "brute", "--k", "5"]) == 0
    got = sorted(map(tuple, spark.read.parquet(bout).collect()))
    q = spark.read.parquet(qpath)
    want = sorted(map(tuple, brute_force_topk(emb, q, k=5).collect()))
    assert got == want

    sout = str(tmp_path / "dense_sq8")
    assert submit_main.main(["dense", "--embeddings", emb_path,
                             "--queries", qpath, "--output", sout,
                             "--method", "sq8", "--k", "5",
                             "--depth", "30"]) == 0
    got = sorted(map(tuple, spark.read.parquet(sout).collect()))
    want = sorted(map(tuple, sq8_topk(emb, q, k=5, depth=30).collect()))
    assert got == want

    pout = str(tmp_path / "dense_pq")
    assert submit_main.main(["dense", "--embeddings", emb_path,
                             "--queries", qpath, "--output", pout,
                             "--method", "pq", "--k", "5"]) == 0
    assert spark.read.parquet(pout).count() == 15


def test_cli_scrub_and_write_kept(spark, corpus_path, tmp_path):
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.operators.curation import curate

    sout = str(tmp_path / "scrubbed")
    assert submit_main.main(["scrub", "--input", corpus_path,
                             "--output", sout]) == 0
    red = spark.read.parquet(sout)
    corpus_cols = set(spark.read.parquet(corpus_path).columns)
    # CLI preserves the full input schema (content redacted in place) and
    # appends the per-class counts — no metadata columns are dropped.
    assert set(red.columns) == corpus_cols | {"n_email", "n_ipv4",
                                              "n_hexsecret"}
    assert red.count() == spark.read.parquet(corpus_path).count()
    # re-scrubbing a scrub output must not collide on the n_* columns
    sout2 = str(tmp_path / "scrubbed2")
    assert submit_main.main(["scrub", "--input", sout,
                             "--output", sout2]) == 0
    assert set(spark.read.parquet(sout2).columns) == set(red.columns)

    out = str(tmp_path / "verdict2")
    kept_path = str(tmp_path / "kept")
    assert submit_main.main(["curate", "--input", corpus_path,
                             "--output", out,
                             "--max-top-bigram-frac", "0.04",
                             "--write-kept", kept_path]) == 0
    corpus = spark.read.parquet(corpus_path)
    want = curate(corpus, max_top_bigram_frac=0.04)
    n_keep = want.filter(F.col("keep")).count()
    kept = spark.read.parquet(kept_path)
    assert kept.count() == n_keep
    assert set(kept.columns) == set(corpus.columns)


def test_cli_semdedup_and_heldout_lm(spark, sf_dir, corpus_path, tmp_path):
    from pyspark.sql import functions as F

    from invertedfiles_jl_spark.functions.text import lm_perplexity
    from invertedfiles_jl_spark.operators.ann import semantic_dedup

    emb_path = f"{sf_dir}/embeddings.parquet"
    out = str(tmp_path / "semdedup_res")
    assert submit_main.main(["semdedup", "--embeddings", emb_path,
                             "--output", out, "--threshold", "0.4",
                             "--n-clusters", "8"]) == 0
    got = {r.vec_id: (r.kept, r.dup_of)
           for r in spark.read.parquet(out).collect()}
    emb = spark.read.parquet(emb_path)
    want = {r.vec_id: (r.kept, r.dup_of)
            for r in semantic_dedup(emb, threshold=0.4, n_clusters=8).collect()}
    assert got == want

    corpus = spark.read.parquet(corpus_path)
    half = str(tmp_path / "train_half")
    corpus.filter(F.col("doc_id") < 250).write.parquet(half)
    lout = str(tmp_path / "lm_heldout")
    assert submit_main.main(["score", "--input", corpus_path,
                             "--output", lout, "--mode", "lm",
                             "--train", half]) == 0
    got_lm = {r.doc_id: r.ppl for r in spark.read.parquet(lout).collect()}
    want_lm = {r.doc_id: r.ppl for r in lm_perplexity(
        corpus, train_df=corpus.filter(F.col("doc_id") < 250)).collect()}
    assert got_lm == want_lm
