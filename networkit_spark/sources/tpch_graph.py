"""Edge-table derivations from the driver's TPC-H-ish parquet tables.

These give the driver-facing queries real graphs with skew:
  * customer→supplier directed bipartite graph (orders ⋈ lineitem):
    weight = number of lineitems between the pair; suppliers are all
    dangling (no out-edges) — exercising PageRank's dropped-mass semantics.
  * supplier co-purchase graph: suppliers sharing a part, weight = number
    of shared parts — dense, triangle-rich, undirected.

Both derivations are single joins + groupBys, fully mirrored by the DuckDB
oracle SQL in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF

SUPPLIER_ID_OFFSET = 1_000_000  # disjoint id space for the bipartite graph


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def customer_supplier_graph(spark: SparkSession, sf_dir: str) -> GraphDF:
    """Directed weighted bipartite graph custkey → (offset + suppkey)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").cast("long").alias("src"),
            (F.lit(SUPPLIER_ID_OFFSET) + F.col("l_suppkey")).cast("long").alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return GraphDF.from_edges(edges, directed=True, weighted=True)


def supplier_co_graph(spark: SparkSession, sf_dir: str) -> GraphDF:
    """Undirected weighted graph: suppliers sharing ≥1 part; weight = number
    of distinct shared parts. Canonical src < dst."""
    ps = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    a = ps.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sa")
    )
    b = ps.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sb")
    )
    edges = (
        a.join(b, "pk")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy(
            F.col("sa").cast("long").alias("src"),
            F.col("sb").cast("long").alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return GraphDF.from_edges(edges, directed=False, weighted=True)


# ------------------------------------------------------- matching oracle CTEs
CS_EDGES_CTE = """
edges AS (
  SELECT CAST(o.o_custkey AS BIGINT) AS src,
         CAST(1000000 + l.l_suppkey AS BIGINT) AS dst,
         CAST(COUNT(*) AS DOUBLE) AS weight
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)
"""

SUPPLIER_CO_EDGES_CTE = """
ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
edges AS (
  SELECT CAST(a.l_suppkey AS BIGINT) AS src,
         CAST(b.l_suppkey AS BIGINT) AS dst,
         CAST(COUNT(*) AS DOUBLE) AS weight
  FROM ps a JOIN ps b
    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
)
"""
