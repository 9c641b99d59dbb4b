#!/usr/bin/env python
"""spark-submit entrypoint (north rule: `spark-submit --py-files` deploy).

Usage:
  spark-submit --py-files invertedfiles_jl_spark.zip submit_main.py \
      build --input /path/corpus_parquet --index /path/index \
            [--weighting bm25] [--content-col content] [--compress] [--no-resume]

  spark-submit --py-files invertedfiles_jl_spark.zip submit_main.py \
      shard --index /path/index --output /path/shards [--n-shards 32]

  spark-submit --py-files invertedfiles_jl_spark.zip submit_main.py \
      query --index /path/index --queries /path/queries_parquet \
            --output /path/results [--k 10] [--plan wand|relational|sharded] \
            [--shards /path/shards --n-shards 32]

On a cluster, ship the package with
  `python -m zipfile -c invertedfiles_jl_spark.zip invertedfiles_jl_spark`
and pass it via --py-files; locally the package import works directly.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="invertedfiles-submit")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="checkpointed index build")
    b.add_argument("--input", required=True, help="corpus parquet path or table")
    b.add_argument("--index", required=True, help="index output directory")
    b.add_argument("--weighting", default="bm25",
                   choices=["bm25", "normcosine", "binary"])
    b.add_argument("--doc-col", default="doc_id")
    b.add_argument("--content-col", default="content")
    b.add_argument("--compress", action="store_true")
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--salt-df-threshold", type=int, default=10_000)

    s = sub.add_parser("shard", help="persist the doc-sharded serving layout")
    s.add_argument("--index", required=True)
    s.add_argument("--output", required=True, help="shards table output directory")
    s.add_argument("--n-shards", type=int, default=32,
                   help="shard count; on a cluster set to the executor count")

    v = sub.add_parser(
        "serve",
        help="streaming top-k serve: standing queries over a document "
             "file-stream (streaming.serve); drains with availableNow and "
             "writes the final per-query top-k.  A long-running deployment "
             "attaches its own sink to streaming_bm25_topk instead.")
    v.add_argument("--index", required=True, help="frozen-stats index snapshot")
    v.add_argument("--queries", required=True,
                   help="parquet with (query_id long, content string)")
    v.add_argument("--stream-src", required=True,
                   help="parquet directory read as a file stream "
                        "(doc_id long, content string)")
    v.add_argument("--output", required=True)
    v.add_argument("--k", type=int, default=10)
    v.add_argument("--rank-round", type=int, default=6)
    v.add_argument("--checkpoint", default=None,
                   help="streaming checkpoint dir (default: fresh temp dir)")
    v.add_argument("--max-files-per-trigger", type=int, default=None,
                   help="micro-batch size in files (smoke/testing)")

    d = sub.add_parser(
        "delete",
        help="index maintenance: remove documents (map-only postings "
             "rewrite, frozen scoring statistics) and write a new index root")
    d.add_argument("--index", required=True)
    d.add_argument("--output", required=True,
                   help="NEW index root (blue/green: must differ from --index)")
    d.add_argument("--delete-ids", default=None,
                   help="parquet with a doc_id column")
    d.add_argument("--ids", default=None,
                   help="comma-separated doc ids (small ad-hoc deletes)")

    pr = sub.add_parser(
        "prune",
        help="index maintenance: drop posting lists by document frequency "
             "(stopword / rare-term compaction) into a new index root")
    pr.add_argument("--index", required=True)
    pr.add_argument("--output", required=True)
    pr.add_argument("--min-df", type=int, default=None)
    pr.add_argument("--max-df", type=int, default=None)
    pr.add_argument("--max-df-ratio", type=float, default=None)

    bp = sub.add_parser(
        "build-positional",
        help="build the positional postings table (token offsets per "
             "(term, doc) — the phrase-search layout)")
    bp.add_argument("--input", required=True)
    bp.add_argument("--output", required=True)
    bp.add_argument("--doc-col", default="doc_id")
    bp.add_argument("--content-col", default="content")

    sp = sub.add_parser(
        "split",
        help="deterministic hash split (train/val/test) — append-stable, "
             "map-only; writes the input plus a `split` column")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--weights", default="train=0.98,val=0.01,test=0.01",
                    help="name=weight pairs, comma-separated (normalized)")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--salt", default="split")

    pk = sub.add_parser(
        "pack",
        help="sequence-packing manifest: concat-and-cut the corpus into "
             "ctx-token training shards (operators.packing) — one row per "
             "(doc, shard it touches)")
    pk.add_argument("--input", required=True)
    pk.add_argument("--output", required=True)
    pk.add_argument("--ctx", type=int, required=True,
                    help="shard length in tokens")
    pk.add_argument("--content-col", default="content")

    sm = sub.add_parser(
        "sample",
        help="deterministic stratum rebalancing: temperature sampling "
             "(rates from the live stratum counts) or fixed per-stratum "
             "fractions — map-only, append-stable")
    sm.add_argument("--input", required=True)
    sm.add_argument("--output", required=True)
    sm.add_argument("--strata-col", required=True)
    sm.add_argument("--temperature", type=float, default=None,
                    help="temperature-sample with this T (rates ∝ (c_min/c)^(1-1/T))")
    sm.add_argument("--fractions", default=None,
                    help="name=rate pairs, comma-separated (fixed-rate mode)")
    sm.add_argument("--default-fraction", type=float, default=0.0)
    sm.add_argument("--id-col", default="doc_id")
    sm.add_argument("--salt", default=None,
                    help="hash salt (default: 'temp' / 'sample' per mode)")

    dn = sub.add_parser(
        "dense",
        help="dense (embedding) top-k search: brute-force cosine, IVF "
             "probe, SQ8 int8 quantized, or PQ-ADC — approximate methods "
             "re-score exactly before ranking")
    dn.add_argument("--embeddings", required=True,
                    help="parquet with (vec_id long, embedding array<float>)")
    dn.add_argument("--queries", required=True,
                    help="parquet with (query_id long, q_emb array<float>)")
    dn.add_argument("--output", required=True)
    dn.add_argument("--method", default="brute",
                    choices=["brute", "ivf", "sq8", "pq"])
    dn.add_argument("--k", type=int, default=10)
    dn.add_argument("--depth", type=int, default=50,
                    help="candidate depth before exact re-score (sq8/pq)")
    dn.add_argument("--n-clusters", type=int, default=16)
    dn.add_argument("--nprobe", type=int, default=4)
    dn.add_argument("--pq-m", type=int, default=8)
    dn.add_argument("--pq-ksub", type=int, default=16)
    dn.add_argument("--include-self", action="store_true",
                    help="keep vec_id == query_id matches (default: excluded)")

    cu = sub.add_parser(
        "curate",
        help="composed curation verdict: lang → quality → exact-dup → "
             "near-dup gates, per-doc keep/reason (first failing gate) — "
             "writes (doc_id, keep, reason) and prints per-reason counts")
    cu.add_argument("--input", required=True)
    cu.add_argument("--output", required=True)
    cu.add_argument("--langs", default="en",
                    help="comma-separated accepted pred_lang values")
    cu.add_argument("--quality-min", type=float, default=0.45)
    cu.add_argument("--near-threshold", type=float, default=0.5)
    cu.add_argument("--max-top-bigram-frac", type=float, default=None,
                    help="arm the Gopher repetition gate at this threshold")
    cu.add_argument("--write-kept", default=None,
                    help="also write the surviving input rows to this path")
    cu.add_argument("--doc-col", default="doc_id")
    cu.add_argument("--content-col", default="content")

    sc = sub.add_parser(
        "score",
        help="per-document text scores: quality heuristic, unigram-LM "
             "perplexity, language ID, or token stats — map-only "
             "(lm trains the unigram model from the input corpus itself)")
    sc.add_argument("--input", required=True)
    sc.add_argument("--output", required=True)
    sc.add_argument("--mode", default="quality",
                    choices=["quality", "lm", "lang", "tokens", "repetition"])
    sc.add_argument("--train", default=None,
                    help="lm mode: fit the unigram model on THIS corpus and "
                         "score --input held-out against it")
    sc.add_argument("--doc-col", default="doc_id")
    sc.add_argument("--content-col", default="content")

    sd = sub.add_parser(
        "semdedup",
        help="SemDeDup-style dense dedup: (vec_id, kept, dup_of) via "
             "IVF-cluster-bucketed cosine pairs, keep-min policy")
    sd.add_argument("--embeddings", required=True)
    sd.add_argument("--output", required=True)
    sd.add_argument("--threshold", type=float, default=0.95)
    sd.add_argument("--n-clusters", type=int, default=16)
    sd.add_argument("--n-bands", type=int, default=None,
                    help="arm the in-cluster sign-band LSH prune")
    sd.add_argument("--band-width", type=int, default=8)

    sb = sub.add_parser(
        "scrub",
        help="PII scrub: count + redact emails / ipv4 / hex secrets "
             "(map-only; writes the input schema with content replaced by "
             "the redacted text plus per-class counts)")
    sb.add_argument("--input", required=True)
    sb.add_argument("--output", required=True)
    sb.add_argument("--doc-col", default="doc_id")
    sb.add_argument("--content-col", default="content")

    pf = sub.add_parser(
        "profile",
        help="one-row corpus statistics report (doc-length/df percentiles) "
             "— sizes partitioning and salting before a build")
    pf.add_argument("--input", required=True)
    pf.add_argument("--output", default=None,
                    help="optional parquet output; prints the row either way")
    pf.add_argument("--doc-col", default="doc_id")
    pf.add_argument("--content-col", default="content")

    ph = sub.add_parser("phrase", help="phrase / proximity / snippet top-k "
                                       "over a positional table")
    ph.add_argument("--positional", required=True,
                    help="positional postings parquet (from build-positional)")
    ph.add_argument("--phrases", required=True,
                    help="parquet with (query_id long, content string) phrases")
    ph.add_argument("--output", required=True)
    ph.add_argument("--k", type=int, default=10)
    ph.add_argument("--mode", default="phrase",
                    choices=["phrase", "proximity", "snippet"],
                    help="phrase = exact consecutive match (rank by count); "
                         "proximity = ordered min-span; snippet = proximity "
                         "plus the earliest minimal window text")
    ph.add_argument("--max-span", type=int, default=None,
                    help="proximity/snippet: drop docs whose min ordered "
                         "span exceeds this")
    ph.add_argument("--corpus", default=None,
                    help="snippet mode: corpus parquet/table for the window "
                         "text (doc_id, content)")

    bt = sub.add_parser(
        "build-trigram",
        help="build the character-trigram substring index (pg_trgm analog)")
    bt.add_argument("--input", required=True)
    bt.add_argument("--output", required=True)
    bt.add_argument("--doc-col", default="doc_id")
    bt.add_argument("--content-col", default="content")

    ss = sub.add_parser(
        "substring",
        help="exact substring search over a trigram index: candidates from "
             "the rarest needle trigrams, verified against the text")
    ss.add_argument("--trigram", required=True,
                    help="trigram postings parquet (from build-trigram)")
    ss.add_argument("--corpus", required=True,
                    help="corpus parquet/table for verification (doc_id, content)")
    ss.add_argument("--needles", required=True,
                    help="parquet with (query_id long, needle string)")
    ss.add_argument("--output", required=True)
    ss.add_argument("--max-grams", type=int, default=8)
    ss.add_argument("--doc-col", default="doc_id")
    ss.add_argument("--content-col", default="content")

    rk = sub.add_parser(
        "rerank",
        help="MMR diversity re-rank over dense candidates "
             "(operators.rerank.mmr_rerank)")
    rk.add_argument("--embeddings", required=True,
                    help="parquet with (vec_id long, embedding array)")
    rk.add_argument("--queries", required=True,
                    help="parquet with (query_id long, q_emb array)")
    rk.add_argument("--output", required=True)
    rk.add_argument("--k", type=int, default=10)
    rk.add_argument("--depth", type=int, default=50)
    rk.add_argument("--lam", type=float, default=0.7)

    qs = sub.add_parser(
        "qstring",
        help="query-string search: one Lucene-QueryParser-style string per "
             "query (+must -not \"phrase\" \"sloppy\"~N bare) over a bm25 "
             "index + positional postings (operators.querystring)")
    qs.add_argument("--index", required=True, help="bm25 index directory")
    qs.add_argument("--positional", required=True,
                    help="positional postings parquet (build-positional)")
    qs.add_argument("--queries", required=True,
                    help="parquet with (query_id long, content string) — "
                         "content is the raw query string")
    qs.add_argument("--output", required=True)
    qs.add_argument("--k", type=int, default=10)
    qs.add_argument("--rank-round", type=int, default=None)
    qs.add_argument("--meta", default=None,
                    help="doc metadata parquet (doc_id + qualifier fields) "
                         "— required when query strings carry field:value "
                         "qualifiers")
    qs.add_argument("--qualifier-fields", default="lang,source",
                    help="comma-separated metadata columns addressable as "
                         "field:value qualifiers")
    qs.add_argument("--default-operator", default="or",
                    choices=["or", "and"],
                    help="bare-term semantics: or = optional (Lucene "
                         "default), and = every bare term required")

    pc = sub.add_parser(
        "percolate",
        help="reverse search: match a document batch against standing "
             "queries — plain term queries (streaming.serve.percolate, "
             "conjunctive) or, with --qstring, the full query-string "
             "mini-language (operators.querystring.query_string_percolate)")
    pc.add_argument("--index", required=True, help="frozen-stats index")
    pc.add_argument("--queries", required=True,
                    help="standing queries parquet (query_id long, "
                         "content string)")
    pc.add_argument("--docs", required=True,
                    help="document batch parquet (doc_id long, content "
                         "string, + metadata cols for --qualifier-fields)")
    pc.add_argument("--output", required=True)
    pc.add_argument("--qstring", action="store_true",
                    help="standing queries are mini-language strings")
    pc.add_argument("--qualifier-fields", default="",
                    help="comma-separated doc metadata columns addressable "
                         "as field:value qualifiers (qstring mode)")
    pc.add_argument("--default-operator", default="or",
                    choices=["or", "and"])
    pc.add_argument("--match-any", action="store_true",
                    help="term mode: disjunctive matching instead of the "
                         "default all-in-vocab-terms gate")

    q = sub.add_parser("query", help="batch top-k query")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True,
                   help="parquet with (query_id long, content string)")
    q.add_argument("--output", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--plan", default="wand",
                   choices=["wand", "relational", "sharded", "auto"])
    q.add_argument("--synonyms", default=None,
                   help="parquet with (term, syn, weight) — query-time "
                        "synonym expansion (bm25, relational plan only)")
    q.add_argument("--shards", default=None,
                   help="persisted shards table (from the `shard` subcommand); "
                        "with --plan sharded, serves batches with zero per-batch "
                        "shuffle; omitted, the layout is derived from the index")
    q.add_argument("--n-shards", type=int, default=32)
    q.add_argument("--rank-round", type=int, default=None,
                   help="rank on round(score, n) — makes rankings reproducible "
                        "across plans/partitionings when scores tie within "
                        "float-summation noise (pytest parity uses 6)")
    q.add_argument("--dist", default=None,
                   help="set distance for binary indexes (jaccard|dice|cosine_set|intersection)")

    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from invertedfiles_jl_spark.config import IndexConfig

    spark = SparkSession.builder.getOrCreate()  # spark-submit owns the config

    if args.cmd == "build":
        from invertedfiles_jl_spark.plans.pipeline import build_checkpointed

        corpus = (spark.read.table(args.input) if "/" not in args.input
                  else spark.read.parquet(args.input))
        cfg = IndexConfig(weighting=args.weighting, compress=args.compress,
                          salt_df_threshold=args.salt_df_threshold)
        idx = build_checkpointed(corpus, args.index, cfg,
                                 resume=not args.no_resume,
                                 doc_col=args.doc_col, content_col=args.content_col)
        print(f"built index at {args.index}: n_docs={idx.stats['n_docs']}")
        return 0

    if args.cmd == "build-positional":
        from invertedfiles_jl_spark.operators.positional import positional_postings

        corpus = (spark.read.table(args.input) if "/" not in args.input
                  else spark.read.parquet(args.input))
        positional_postings(corpus, doc_col=args.doc_col,
                            content_col=args.content_col).write.mode(
            "overwrite").parquet(args.output)
        print(f"wrote positional postings to {args.output}")
        return 0

    if args.cmd == "build-trigram":
        from invertedfiles_jl_spark.operators.trigram import build_trigram_index

        corpus = (spark.read.table(args.input) if "/" not in args.input
                  else spark.read.parquet(args.input))
        ti = build_trigram_index(corpus, doc_col=args.doc_col,
                                 content_col=args.content_col)
        ti.postings.write.mode("overwrite").parquet(args.output)
        print(f"wrote trigram postings to {args.output}")
        return 0

    if args.cmd == "substring":
        from invertedfiles_jl_spark.operators.trigram import (
            TrigramIndex,
            substring_search,
        )
        from pyspark.sql import functions as F

        corpus = (spark.read.table(args.corpus) if "/" not in args.corpus
                  else spark.read.parquet(args.corpus))
        ti = TrigramIndex(
            postings=spark.read.parquet(args.trigram),
            corpus=corpus.select(F.col(args.doc_col).alias("doc_id"),
                                 F.col(args.content_col).alias("content")))
        needles = spark.read.parquet(args.needles)
        substring_search(ti, needles, max_grams=args.max_grams) \
            .write.mode("overwrite").parquet(args.output)
        print(f"wrote substring matches to {args.output}")
        return 0

    if args.cmd == "rerank":
        from invertedfiles_jl_spark.operators.rerank import mmr_rerank

        emb = spark.read.parquet(args.embeddings)
        queries = spark.read.parquet(args.queries)
        mmr_rerank(emb, queries, k=args.k, depth=args.depth, lam=args.lam) \
            .write.mode("overwrite").parquet(args.output)
        print(f"wrote MMR rerank to {args.output}")
        return 0

    if args.cmd == "split":
        from invertedfiles_jl_spark.operators.sampling import hash_split

        weights = {}
        for part in args.weights.split(","):
            name, w = part.split("=")
            weights[name.strip()] = float(w)
        data = (spark.read.table(args.input) if "/" not in args.input
                else spark.read.parquet(args.input))
        hash_split(data, weights, id_col=args.id_col, salt=args.salt) \
            .write.mode("overwrite").parquet(args.output)
        print(f"wrote split table to {args.output}")
        return 0

    if args.cmd == "pack":
        from invertedfiles_jl_spark.operators.packing import pack_sequences

        data = (spark.read.table(args.input) if "/" not in args.input
                else spark.read.parquet(args.input))
        pack_sequences(data, ctx=args.ctx, content_col=args.content_col) \
            .write.mode("overwrite").parquet(args.output)
        print(f"wrote packing manifest (ctx={args.ctx}) to {args.output}")
        return 0

    if args.cmd == "sample":
        from invertedfiles_jl_spark.operators.sampling import (
            stratified_sample,
            temperature_sample,
        )

        data = (spark.read.table(args.input) if "/" not in args.input
                else spark.read.parquet(args.input))
        if (args.temperature is None) == (args.fractions is None):
            raise SystemExit("sample: pass exactly one of --temperature / --fractions")
        if args.temperature is not None:
            res = temperature_sample(data, args.strata_col,
                                     temperature=args.temperature,
                                     id_col=args.id_col,
                                     salt=args.salt or "temp")
        else:
            fracs = {}
            for part in args.fractions.split(","):
                name, f = part.split("=")
                fracs[name.strip()] = float(f)
            res = stratified_sample(data, fracs, args.strata_col,
                                    default=args.default_fraction,
                                    id_col=args.id_col,
                                    salt=args.salt or "sample")
        res.write.mode("overwrite").parquet(args.output)
        print(f"wrote sampled table to {args.output}")
        return 0

    if args.cmd == "dense":
        from invertedfiles_jl_spark.operators.ann import (
            brute_force_topk,
            ivf_topk,
            pq_topk,
            sq8_topk,
        )

        emb = (spark.read.table(args.embeddings) if "/" not in args.embeddings
               else spark.read.parquet(args.embeddings))
        qs = (spark.read.table(args.queries) if "/" not in args.queries
              else spark.read.parquet(args.queries))
        ex = not args.include_self
        if args.method == "brute":
            res = brute_force_topk(emb, qs, k=args.k, exclude_self=ex)
        elif args.method == "ivf":
            res = ivf_topk(emb, qs, k=args.k, n_clusters=args.n_clusters,
                           nprobe=args.nprobe, exclude_self=ex)
        elif args.method == "sq8":
            res = sq8_topk(emb, qs, k=args.k, depth=args.depth,
                           exclude_self=ex)
        else:
            res = pq_topk(emb, qs, k=args.k, m=args.pq_m, ksub=args.pq_ksub,
                          depth=args.depth, exclude_self=ex)
        res.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.method} dense top-{args.k} to {args.output}")
        return 0

    if args.cmd == "curate":
        from pyspark.sql import functions as F

        from invertedfiles_jl_spark.operators.curation import curate

        data = (spark.read.table(args.input) if "/" not in args.input
                else spark.read.parquet(args.input))
        res = curate(data, langs=tuple(args.langs.split(",")),
                     quality_min=args.quality_min,
                     near_threshold=args.near_threshold,
                     max_top_bigram_frac=args.max_top_bigram_frac,
                     doc_col=args.doc_col, content_col=args.content_col)
        res.write.mode("overwrite").parquet(args.output)
        verdict = spark.read.parquet(args.output)
        counts = {r["reason"]: r["n"] for r in
                  verdict.groupBy("reason")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
        if args.write_kept:
            kept = verdict.filter(F.col("keep")).select(
                F.col("doc_id").alias(args.doc_col))
            data.join(kept, args.doc_col, "left_semi").write.mode(
                "overwrite").parquet(args.write_kept)
        print(f"curated to {args.output}: {counts}")
        return 0

    if args.cmd == "score":
        from invertedfiles_jl_spark.functions.text import (
            lang_id,
            lm_perplexity,
            quality_score,
            token_stats,
        )

        data = (spark.read.table(args.input) if "/" not in args.input
                else spark.read.parquet(args.input))
        from invertedfiles_jl_spark.functions.text import repetition_stats

        fn = {"quality": quality_score, "lm": lm_perplexity,
              "lang": lang_id, "tokens": token_stats,
              "repetition": repetition_stats}[args.mode]
        kw = {}
        if args.train is not None:
            if args.mode != "lm":
                print("--train applies to --mode lm only", file=sys.stderr)
                return 2
            kw["train_df"] = (spark.read.table(args.train)
                              if "/" not in args.train
                              else spark.read.parquet(args.train))
        res = fn(data, doc_col=args.doc_col, content_col=args.content_col,
                 **kw)
        res.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.mode} scores to {args.output}")
        return 0

    if args.cmd == "semdedup":
        from invertedfiles_jl_spark.operators.ann import semantic_dedup

        emb = (spark.read.table(args.embeddings)
               if "/" not in args.embeddings
               else spark.read.parquet(args.embeddings))
        res = semantic_dedup(emb, threshold=args.threshold,
                             n_clusters=args.n_clusters,
                             n_bands=args.n_bands,
                             band_width=args.band_width)
        res.write.mode("overwrite").parquet(args.output)
        n_drop = res.filter(~res.kept).count()
        print(f"wrote semdedup verdict to {args.output}: {n_drop} dropped")
        return 0

    if args.cmd == "scrub":
        from invertedfiles_jl_spark.functions.text import scrub_pii

        data = (spark.read.table(args.input) if "/" not in args.input
                else spark.read.parquet(args.input))
        # preserve_schema keeps every input column (content redacted in
        # place, n_* counts appended) in one map-only select — what the
        # CLI help promises, with no doc_id re-join shuffle.
        res = scrub_pii(data, doc_col=args.doc_col,
                        content_col=args.content_col, preserve_schema=True)
        res.write.mode("overwrite").parquet(args.output)
        print(f"wrote scrubbed corpus to {args.output} "
              f"(input schema preserved, {args.content_col} redacted)")
        return 0

    if args.cmd == "profile":
        from invertedfiles_jl_spark.operators.meta import corpus_profile

        data = (spark.read.table(args.input) if "/" not in args.input
                else spark.read.parquet(args.input))
        prof = corpus_profile(data, doc_col=args.doc_col,
                              content_col=args.content_col)
        row = prof.first()
        print({f: row[f] for f in prof.columns})
        if args.output:
            prof.write.mode("overwrite").parquet(args.output)
        return 0

    if args.cmd == "phrase":
        from invertedfiles_jl_spark.operators.positional import (
            phrase_topk,
            proximity_topk,
            snippet_topk,
        )

        pos = spark.read.parquet(args.positional)
        phrases = spark.read.parquet(args.phrases)
        if args.mode == "phrase":
            res = phrase_topk(pos, phrases, k=args.k)
        elif args.mode == "proximity":
            res = proximity_topk(pos, phrases, k=args.k,
                                 max_span=args.max_span)
        else:
            assert args.corpus, "--corpus is required with --mode snippet"
            corpus = (spark.read.table(args.corpus)
                      if "/" not in args.corpus
                      else spark.read.parquet(args.corpus))
            res = snippet_topk(pos, phrases, corpus, k=args.k,
                               max_span=args.max_span)
        res.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.mode} results to {args.output}")
        return 0

    from invertedfiles_jl_spark.plans.pipeline import load_index, save_index

    if args.cmd == "qstring":
        from invertedfiles_jl_spark.operators.querystring import (
            query_string_topk,
        )

        idx = load_index(spark, args.index)
        pos = spark.read.parquet(args.positional)
        queries = spark.read.parquet(args.queries)
        meta = spark.read.parquet(args.meta) if args.meta else None
        res = query_string_topk(
            idx, pos, queries, k=args.k, rank_round=args.rank_round,
            meta=meta,
            qualifier_fields=tuple(
                f.strip() for f in args.qualifier_fields.split(",")
                if f.strip()),
            default_operator=args.default_operator)
        res.write.mode("overwrite").parquet(args.output)
        print(f"wrote query-string results to {args.output}")
        return 0

    if args.cmd == "percolate":
        idx = load_index(spark, args.index)
        standing = spark.read.parquet(args.queries)
        docs = spark.read.parquet(args.docs)
        if args.qstring:
            from invertedfiles_jl_spark.operators.querystring import (
                query_string_percolate,
            )

            qf = tuple(f.strip() for f in args.qualifier_fields.split(",")
                       if f.strip())
            res = query_string_percolate(
                idx, standing, docs, qualifier_fields=qf,
                default_operator=args.default_operator)
        else:
            from invertedfiles_jl_spark.streaming.serve import percolate

            res = percolate(idx, standing, docs,
                            require_all=not args.match_any)
        res.write.mode("overwrite").parquet(args.output)
        print(f"wrote percolation matches to {args.output}")
        return 0

    if args.cmd == "delete":
        from invertedfiles_jl_spark.operators.maintenance import delete_documents

        assert args.output != args.index, "--output must be a NEW index root"
        idx = load_index(spark, args.index)
        if args.delete_ids:
            dels = spark.read.parquet(args.delete_ids)
        elif args.ids:
            dels = [int(x) for x in args.ids.split(",") if x.strip()]
        else:
            raise SystemExit("delete: pass --delete-ids or --ids")
        save_index(delete_documents(idx, dels), args.output)
        print(f"wrote deleted index to {args.output}")
        return 0

    if args.cmd == "prune":
        from invertedfiles_jl_spark.operators.maintenance import prune_postings

        assert args.output != args.index, "--output must be a NEW index root"
        idx = load_index(spark, args.index)
        save_index(prune_postings(idx, min_df=args.min_df, max_df=args.max_df,
                                  max_df_ratio=args.max_df_ratio), args.output)
        print(f"wrote pruned index to {args.output}")
        return 0

    if args.cmd == "shard":
        from invertedfiles_jl_spark.operators.sharded import shard_postings

        idx = load_index(spark, args.index)
        shard_postings(idx, n_shards=args.n_shards).write.mode(
            "overwrite").parquet(args.output)
        print(f"wrote {args.n_shards}-shard serving layout to {args.output}")
        return 0

    if args.cmd == "serve":
        import tempfile
        import uuid

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from invertedfiles_jl_spark.streaming.serve import streaming_bm25_topk

        idx = load_index(spark, args.index)
        assert idx.cfg.weighting == "bm25", "serve requires a bm25 index snapshot"
        queries = spark.read.parquet(args.queries)
        reader = spark.readStream.schema("doc_id long, content string")
        if args.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", args.max_files_per_trigger)
        stream = reader.option("recursiveFileLookup", "true").parquet(args.stream_src)
        out = streaming_bm25_topk(stream, idx, queries, k=args.k,
                                  rank_round=args.rank_round)
        sink = f"serve_{uuid.uuid4().hex[:10]}"
        ckpt = args.checkpoint or tempfile.mkdtemp(prefix="ifserve_ckpt_")
        sq = (
            out.writeStream.format("memory").queryName(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination()  # availableNow terminates once the src drains
        emitted = spark.table(sink)
        w = Window.partitionBy("query_id")
        final = emitted.withColumn("mx", F.max("n_seen").over(w)).filter(
            F.col("n_seen") == F.col("mx")).drop("mx")
        final.write.mode("overwrite").parquet(args.output)
        print(f"served {final.count()} result rows to {args.output}")
        return 0

    if args.synonyms and args.plan != "relational":
        raise SystemExit("--synonyms requires --plan relational")
    idx = load_index(spark, args.index)
    queries = spark.read.parquet(args.queries)
    rr = args.rank_round
    if idx.cfg.weighting == "binary":
        if args.plan == "sharded":
            from invertedfiles_jl_spark.operators.sharded import (
                load_shards,
                sharded_set_topk,
            )

            if args.shards:
                sharded = load_shards(spark, args.shards, n_shards=args.n_shards)
                res = sharded_set_topk(idx, queries, k=args.k,
                                       dist=args.dist or "jaccard",
                                       sharded=sharded, assume_colocated=True,
                                       rank_round=rr)
            else:
                res = sharded_set_topk(idx, queries, k=args.k,
                                       dist=args.dist or "jaccard",
                                       n_shards=args.n_shards, rank_round=rr)
        else:
            from invertedfiles_jl_spark.operators.search import set_distance_topk

            res = set_distance_topk(idx, queries, k=args.k,
                                    dist=args.dist or "jaccard", rank_round=rr)
    elif args.plan == "sharded":
        from invertedfiles_jl_spark.operators.sharded import load_shards, sharded_topk

        if args.shards:
            sharded = load_shards(spark, args.shards, n_shards=args.n_shards)
            res = sharded_topk(idx, queries, k=args.k, sharded=sharded,
                               assume_colocated=True, rank_round=rr)
        else:
            res = sharded_topk(idx, queries, k=args.k, n_shards=args.n_shards,
                               rank_round=rr)
    elif args.plan == "wand":
        from invertedfiles_jl_spark.operators.wand import wand_topk

        res = wand_topk(idx, queries, k=args.k, rank_round=rr)
    elif args.plan == "auto":
        from invertedfiles_jl_spark.plans.router import auto_topk

        assert idx.cfg.weighting == "bm25", "--plan auto requires a bm25 index"
        res = auto_topk(idx, queries, k=args.k, rank_round=rr,
                        n_shards=args.n_shards)
    elif args.synonyms:
        from invertedfiles_jl_spark.operators.search import synonym_bm25_topk

        assert idx.cfg.weighting == "bm25", "--synonyms requires a bm25 index"
        syn = spark.read.parquet(args.synonyms)
        res = synonym_bm25_topk(idx, queries, syn, k=args.k, rank_round=rr)
    else:
        from invertedfiles_jl_spark.operators.search import bm25_topk, cosine_topk

        res = (bm25_topk(idx, queries, k=args.k, rank_round=rr)
               if idx.cfg.weighting == "bm25"
               else cosine_topk(idx, queries, k=args.k, rank_round=rr))
    res.write.mode("overwrite").parquet(args.output)
    print(f"wrote results to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
