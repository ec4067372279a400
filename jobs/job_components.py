"""spark-submit entry point: (weakly) connected components.

    spark-submit --py-files networkit_spark.zip jobs/job_components.py \
        --edges /path/edges.parquet --output /path/out [--checkpoint dir]
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--directed", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("nk-spark-cc").getOrCreate()
    from networkit_spark.graph import GraphDF
    from networkit_spark.operators.components import (
        connected_components,
        weakly_connected_components,
    )
    from networkit_spark.plans.checkpoint import SuperstepCheckpointer

    g = GraphDF.from_edges(
        spark.read.parquet(args.edges), directed=args.directed, weighted=True
    )
    ck = (
        SuperstepCheckpointer(spark, args.checkpoint, "cc")
        if args.checkpoint
        else None
    )
    fn = weakly_connected_components if args.directed else connected_components
    fn(g, checkpointer=ck).write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
