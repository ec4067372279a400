"""spark-submit entry point: per-node triangle counts (+ optional LCC).

    spark-submit --py-files networkit_spark.zip jobs/job_triangles.py \
        --edges /path/edges.parquet --output /path/out [--lcc]

Completes the core-four job surface (pagerank / components / plp /
triangles — north rule). The operator orients edges by degree and
broadcasts the closing-edge set as packed longs when it fits, so the
wedge stream is never exchanged (operators/triangles.py:50).
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--lcc", action="store_true",
                    help="also emit the local clustering coefficient")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("nk-spark-triangles").getOrCreate()
    from networkit_spark.graph import GraphDF
    from networkit_spark.operators.triangles import (
        local_clustering_coefficient,
        triangle_counts,
    )

    g = GraphDF.from_edges(
        spark.read.parquet(args.edges), directed=False, weighted=True
    )
    out = triangle_counts(g)
    if args.lcc:
        out = out.join(local_clustering_coefficient(g), "id", "left")
    out.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
