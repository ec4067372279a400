"""Full-text relevance retrieval (Okapi BM25) over the documents table.

The query side of a corpus engine: score every document against a small
set of keyword queries and return the top-k per query. The classic use in
a training-data pipeline is nearest-benchmark retrieval (pull the corpus
documents most similar to an eval set before a manual contamination
audit) and corpus exploration at scale.

Scale shape:
- the tokenize → (doc, term) tf table is the same explode+agg used by the
  text metrics (map-side combine);
- the query term set is tiny and BROADCAST; candidate docs are the
  broadcast-semi-join survivors (docs sharing ≥1 query term) — the corpus
  is never shuffled on anything wider than the matched (term) key;
- document frequency is computed ONLY for query terms (count over the
  filtered tf table);
- per-query top-k uses the two-stage salted pattern from
  stratified_quota_sample — a naive row_number() over PARTITION BY query
  would put every candidate for a hot query in one task.

Determinism: scores are rounded to 6 and ranked with a doc-id tie-break
(CLAUDE.md rule 5); ln() is the natural log in both engines.
Training-pipeline op beyond the reference (round brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_search(
    docs: DataFrame,
    queries: list[str],
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_salts: int = 32,
) -> DataFrame:
    """(query, rank, doc_id, score): top-k documents per keyword query by
    Okapi BM25 (k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    duplicate query terms count once)."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " ")
        ).alias("tok"),
    )
    tf = toks.groupBy("id", "tok").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    qterms = spark.createDataFrame(
        sorted({(q, t) for q in queries for t in q.split()}),
        ["query", "tok"],
    )
    # candidates: only (doc, term) rows whose term some query mentions
    qtf = tf.join(F.broadcast(qterms.select("tok").distinct()), "tok")
    dfreq = qtf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = (
        qtf.join(F.broadcast(qterms), "tok")
        .join(F.broadcast(dfreq), "tok")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query",
            "id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
        .groupBy("query", "id")
        .agg(F.round(F.sum("term_score"), 6).alias("score"))
    )
    # two-stage salted top-k (hot queries never own a whole-candidate task)
    salted = scored.withColumn("_salt", F.pmod(F.col("id"), F.lit(n_salts)))
    w1 = Window.partitionBy("query", "_salt").orderBy(
        F.desc("score"), F.asc("id")
    )
    finalists = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("id"))
    return (
        finalists.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query",
            F.col("rank").cast("long").alias("rank"),
            F.col("id").alias("doc_id"),
            "score",
        )
    )
