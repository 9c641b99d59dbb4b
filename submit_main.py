#!/usr/bin/env python
"""spark-submit entrypoint (north rule: `spark-submit --py-files` deploy).

Usage:
  spark-submit --py-files invertedfiles_jl_spark.zip submit_main.py \
      build --input /path/corpus_parquet --index /path/index \
            [--weighting bm25] [--content-col content] [--compress] [--no-resume]

  spark-submit --py-files invertedfiles_jl_spark.zip submit_main.py \
      query --index /path/index --queries /path/queries_parquet \
            --output /path/results [--k 10] [--plan wand|relational]

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

    q = sub.add_parser("query", help="batch top-k query")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True,
                   help="parquet with (query_id long, content string)")
    q.add_argument("--output", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--plan", default="wand", choices=["wand", "relational"])
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

    from invertedfiles_jl_spark.plans.pipeline import load_index

    idx = load_index(spark, args.index)
    queries = spark.read.parquet(args.queries)
    if idx.cfg.weighting == "binary":
        from invertedfiles_jl_spark.operators.search import set_distance_topk

        res = set_distance_topk(idx, queries, k=args.k, dist=args.dist or "jaccard")
    elif args.plan == "wand":
        from invertedfiles_jl_spark.operators.wand import wand_topk

        res = wand_topk(idx, queries, k=args.k)
    else:
        from invertedfiles_jl_spark.operators.search import bm25_topk, cosine_topk

        res = (bm25_topk(idx, queries, k=args.k) if idx.cfg.weighting == "bm25"
               else cosine_topk(idx, queries, k=args.k))
    res.write.mode("overwrite").parquet(args.output)
    print(f"wrote results to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
