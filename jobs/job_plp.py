"""spark-submit entry point: synchronous label propagation + modularity.

    spark-submit --py-files networkit_spark.zip jobs/job_plp.py \
        --edges /path/edges.parquet --output /path/out \
        [--checkpoint dir] [--max-iterations 32]

The convenience driver analog of nk.community.detectCommunities
(networkit/community.pyx:1071-1087): runs PLP, reports modularity, writes
the partition. Iteration metrics land in <checkpoint>/plp/metrics.jsonl.
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--max-iterations", type=int, default=32)
    ap.add_argument("--update-threshold", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("nk-spark-plp").getOrCreate()
    from networkit_spark.graph import GraphDF
    from networkit_spark.operators.community import coverage, modularity
    from networkit_spark.operators.plp import compact_partition, plp
    from networkit_spark.plans.checkpoint import SuperstepCheckpointer

    g = GraphDF.from_edges(
        spark.read.parquet(args.edges), directed=False, weighted=True
    )
    ck = (
        SuperstepCheckpointer(spark, args.checkpoint, "plp")
        if args.checkpoint
        else None
    )
    labels = plp(
        g,
        update_threshold=args.update_threshold,
        max_iterations=args.max_iterations,
        checkpointer=ck,
    )
    labels = compact_partition(labels)
    labels.persist()
    q = modularity(g, labels)
    cov = coverage(g, labels)
    k = labels.select("label").distinct().count()
    print(f"communities={k} modularity={q:.6f} coverage={cov:.6f}")
    labels.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
