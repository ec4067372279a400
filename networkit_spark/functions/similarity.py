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
            cm /= np.where(cn == 0, 1, cn)
            # (nq, batch) C-order so the per-query top-k partition below
            # scans CONTIGUOUS rows. The (batch, nq) orientation put
            # argpartition on a stride-nq axis — measured 0.30s/batch vs
            # 0.067s here (the GEMM itself is 0.013-0.07s: the selection,
            # not the multiply, was the kernel's bottleneck).
            sims = qm @ cm.T
            topk = min(k + 1, sims.shape[1])
            # top-k from the high end — avoids materializing a negated copy
            idx = np.argpartition(sims, sims.shape[1] - topk, axis=1)[:, -topk:]
            qcol = np.repeat(qids, topk)
            ccol = cids[idx.ravel()]
            scol = np.take_along_axis(sims, idx, axis=1).ravel()
            mask = qcol != ccol
            yield pd.DataFrame(
                {"qid": qcol[mask], "cid": ccol[mask], "cos": scol[mask]}
            )

    from pyspark.sql import Window

    cand = corpus.select(id_col, vec_col).mapInPandas(part, schema)
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", F.round("cos", 6).alias("cos"), "rank")
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    path between sign-LSH and brute force: `n_cells` corpus vectors become
    coarse centroids (LCG-seeded sample, so the whole index is ANSI-SQL
    reproducible), every corpus vector is assigned to its nearest centroid
    by rounded cosine, and a query searches only the union of its `nprobe`
    nearest cells.

    At scale the cell id is the partition key: the corpus shuffles ONCE at
    index build (the assignment), and each query's probe is an equi-join on
    cell — candidates per query ≈ nprobe/n_cells of the corpus, never
    all-pairs. Centroids are n_cells rows (broadcast metadata). Output
    schema matches knn_bruteforce; recall < 1 by design (tested vs brute
    force)."""
    from pyspark.sql import Window

    A, C, M = 1103515245, 12345, 2147483648
    lcg = (F.col(id_col).cast("long") + F.lit(seed)) * F.lit(A) + F.lit(C)
    cents = (
        corpus.select(F.col(id_col).alias("ctid"), F.col(vec_col).alias("cvv"))
        .orderBy(F.pmod(lcg.cast("long"), F.lit(M)), F.col("ctid"))
        .limit(n_cells)
    )

    def _nearest(side: DataFrame, sid: str, svec: str, rank_to: int, out: str):
        scored = side.join(F.broadcast(cents)).select(
            sid,
            "ctid",
            F.round(cosine_expr(svec, "cvv"), 6).alias("ccos"),
        )
        w = Window.partitionBy(sid).orderBy(F.desc("ccos"), F.asc("ctid"))
        return (
            scored.withColumn("crk", F.row_number().over(w))
            .filter(F.col("crk") <= rank_to)
            .select(sid, F.col("ctid").alias(out))
        )

    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    assign = c.join(_nearest(c, "cid", "cv", 1, "cell"), "cid")
    probes = _nearest(q, "qid", "qv", nprobe, "cell")
    scored = (
        assign.join(F.broadcast(probes), "cell")
        .join(F.broadcast(q), "qid")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", F.round(cosine_expr("qv", "cv"), 6).alias("cos"))
    )  # (qid, cid) is unique: one cell per corpus vector, distinct probes

    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cos", "rank")
    )
