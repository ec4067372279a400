"""networkit_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query/data-processing capabilities of NetworKit
(reference: manpen/networkit v7.1, surveyed in SURVEY.md) as iterative
DataFrame joins, aggregations, windows, and vectorized Arrow UDFs over
an edge table — NOT a port of the reference's C++/OpenMP engine.

Layout:
  session.py     SparkSession factory (AQE, Arrow, shuffle sizing)
  graph.py       GraphDF — V/E DataFrame pair + graph-transform algebra
  sources/       transcripts input layer, edge-list readers/writers, generators
  operators/     iterative kernels: pagerank, components, plp, triangles, ...
  functions/     text analysis, dedup (minhash/simhash), similarity (ANN), multimodal
  plans/         superstep driver, checkpoint/resume protocol, iteration metrics
  streaming/     GraphEvent structured-streaming ingestion
  oracle/        numpy reference implementations (test oracles)
"""

from networkit_spark.graph import GraphDF

__version__ = "0.1.0"
__all__ = ["GraphDF"]
