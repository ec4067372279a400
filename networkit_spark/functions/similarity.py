"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (broadcast the query set,
scan the corpus once — the right plan when |queries| is small). The scale
path is sign-LSH bucketing: h hyperplanes → 2^h buckets → candidates only
within matching buckets, turning the O(n·m) pair space into per-bucket
joins. Hyperplanes are seeded-hash generated, so results are reproducible
with no RNG state.

Dot products use built-in higher-order functions (zip_with + aggregate) —
JVM-side, no Python in the hot path. A vectorized pandas_udf variant is
provided for wide batches where Arrow + numpy BLAS wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_expr(a: str | Column, b: str | Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate, computed in double."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: str | Column, b: str | Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(qid, cid, cos, rank): exact top-k cosine neighbors per query.

    Queries are broadcast (small side); the corpus is scanned once. Ties
    break on candidate id for determinism.
    """
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            # rank on the ROUNDED value with cid tie-break: reproducible
            # across engines/FP summation orders (oracle parity)
            F.round(cosine_expr("qv", "cv"), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cos", "rank")
    )


def _hyperplane(dim: int, seed: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane via an LCG on (seed, plane, i).
    ±1 components suffice for sign-LSH."""
    A, C, M = 1103515245, 12345, 2147483648
    vals = []
    x = (seed * 7919 + plane) % M
    for i in range(dim):
        x = (x * A + C) % M
        vals.append(1.0 if (x >> 16) % 2 == 0 else -1.0)
    return vals


def lsh_bucket_expr(vec_col: str, dim: int, planes: int, seed: int = 42) -> Column:
    """Sign-LSH bucket id: bit b = sign(v · hyperplane_b)."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        hp = _hyperplane(dim, seed, p)
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(v) for v in hp]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(2**p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    planes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    Same output schema as knn_bruteforce; recall < 1 by design. At scale the
    bucket column is a partition key — each query touches one partition."""
    from pyspark.sql import Window

    bq = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        lsh_bucket_expr(vec_col, dim, planes, seed).alias("bucket"),
    )
    bc = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cv"),
        lsh_bucket_expr(vec_col, dim, planes, seed).alias("bucket"),
    )
    scored = (
        bc.join(F.broadcast(bq), "bucket")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", F.round(cosine_expr("qv", "cv"), 6).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cos", "rank")
    )


def knn_bruteforce_pandas(
    corpus: DataFrame,
    queries_pdf,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Arrow/numpy fast path: queries as a driver-side pandas DataFrame
    (qid, vector) matrix-multiplied against each corpus partition via
    mapInPandas — one BLAS GEMM per Arrow batch instead of per-pair
    zip_with. Returns per-partition top-k candidates; final global top-k
    is a small groupBy."""
    import numpy as np
    import pandas as pd

    qids = queries_pdf[id_col].to_numpy()
    qm = np.stack(queries_pdf[vec_col].to_numpy()).astype(np.float64)
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    qm = qm / np.where(qn == 0, 1, qn)

    schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("cid", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def part(batches):
        for pdf in batches:
            cids = pdf[id_col].to_numpy()
            cm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cn = np.linalg.norm(cm, axis=1, keepdims=True)
            cm = cm / np.where(cn == 0, 1, cn)
            sims = cm @ qm.T  # (batch, nq)
            topk = min(k + 1, sims.shape[0])
            idx = np.argpartition(-sims, topk - 1, axis=0)[:topk]
            rows = []
            for j in range(sims.shape[1]):
                for i in idx[:, j]:
                    if cids[i] != qids[j]:
                        rows.append((int(qids[j]), int(cids[i]), float(sims[i, j])))
            yield pd.DataFrame(rows, columns=["qid", "cid", "cos"])

    from pyspark.sql import Window

    cand = corpus.select(id_col, vec_col).mapInPandas(part, schema)
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", F.round("cos", 6).alias("cos"), "rank")
    )
