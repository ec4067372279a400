"""spark-submit entry point: PageRank over a transcript-derived link graph.

    spark-submit --py-files networkit_spark.zip jobs/job_pagerank.py \
        --input /path/to/transcripts_or_edges --graph reply|conv|edges \
        --output /path/out --checkpoint /path/ckpt --tol 1e-6

At cluster scale the same file runs unchanged on a multi-executor master;
the checkpoint dir makes the run resumable mid-iteration (north rule).
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="transcripts parquet dir, or edges parquet for --graph edges")
    ap.add_argument("--graph", default="reply", choices=["reply", "conv", "edges"])
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iterations", type=int, default=100)
    ap.add_argument("--salt-buckets", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("nk-spark-pagerank").getOrCreate()
    from networkit_spark.graph import GraphDF
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.plans.checkpoint import SuperstepCheckpointer
    from networkit_spark.sources.transcripts import (
        conv_adjacency_edges,
        mint_ids,
        reply_pairs,
    )

    if args.graph == "edges":
        edges = spark.read.parquet(args.input)
        g = GraphDF.from_edges(edges, directed=True, weighted=True)
    else:
        t = spark.read.parquet(args.input)
        if args.graph == "reply":
            _, edges = mint_ids(reply_pairs(t))
        else:
            e = conv_adjacency_edges(t)
            edges = e.select(
                F.xxhash64("src_conv").alias("src"),
                F.xxhash64("dst_conv").alias("dst"),
                "weight",
            )
        g = GraphDF.from_edges(edges, directed=True, weighted=True)

    ck = (
        SuperstepCheckpointer(spark, args.checkpoint, "pagerank")
        if args.checkpoint
        else None
    )
    scores = pagerank(
        g,
        damping=args.damping,
        tol=args.tol,
        max_iterations=args.max_iterations,
        checkpointer=ck,
        salt_buckets=args.salt_buckets,
    )
    scores.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
