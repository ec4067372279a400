"""Deterministic sampling & shard packing for training-data pipelines.

The three operations every corpus-preparation run needs after filtering
and dedup, expressed as scale-safe DataFrame programs:

- `deterministic_sample`: Bernoulli subsample by an LCG hash of the id —
  a pure filter (no shuffle, pushdown-friendly), reproducible across
  engines (the LCG is the repo's cross-engine RNG; xxhash64 has no DuckDB
  twin, see CLAUDE.md rule 9).
- `stratified_quota_sample`: EXACT k docs per stratum (e.g. per language
  or per source), chosen by smallest LCG priority. Skew-safe: a naive
  `row_number() OVER (PARTITION BY stratum)` puts an entire stratum in
  one task — at 100 TB the majority-language stratum is half the corpus.
  Instead a two-stage salted top-k: per-(stratum, salt) top-k first
  (bounded survivors: n_salts * k per stratum), then the true per-stratum
  top-k over that small set. Exact because the top-k of a stratum is
  contained in the union of per-salt top-k's for ANY partition into salts.
- `pack_shards`: assign documents to fixed-token-budget training shards
  by the exclusive running sum of token counts in id order — the step
  that turns a filtered corpus into uniform training files. Uses the
  two-stage scale-safe prefix sum (plans/ranking.py), never a
  single-partition window.

All three are LCG/arithmetic-deterministic, so each gets a full DuckDB
oracle in the driver contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2147483648  # 2^31


def lcg_priority(id_col: Column, seed: int = 0) -> Column:
    """One LCG step on (id + seed): uniform-ish deterministic priority in
    [0, 2^31). Pre-mod keeps (x % M) * A < 2^63 — identical overflow-free
    arithmetic in Spark and DuckDB BIGINT."""
    x = (id_col + F.lit(seed)) % F.lit(LCG_M)
    return (x * F.lit(LCG_A) + F.lit(LCG_C)) % F.lit(LCG_M)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep rows whose LCG priority falls below fraction * 2^31 — a
    reproducible Bernoulli(fraction) sample keyed on the id. Pure filter:
    no shuffle, survives predicate pushdown, trivially parallel at any
    scale."""
    thresh = int(fraction * LCG_M)
    return df.filter(lcg_priority(F.col(id_col), seed) < F.lit(thresh))


def stratified_quota_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
    n_salts: int = 32,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, the ones with the k
    smallest LCG priorities (id tie-break). Two-stage salted top-k keeps
    every window partition bounded: stage 1 partitions are ~|stratum|/
    n_salts rows; stage 2 sees at most n_salts * k finalists per stratum."""
    pr = lcg_priority(F.col(id_col), seed)
    salted = df.withColumn("_pr", pr).withColumn(
        "_salt", F.pmod(F.col(id_col), F.lit(n_salts))
    )
    w1 = Window.partitionBy(*strata_cols, "_salt").orderBy("_pr", id_col)
    finalists = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(*strata_cols).orderBy("_pr", id_col)
    return (
        finalists.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .drop("_r2", "_pr")
    )


def pack_shards(
    df: DataFrame,
    shard_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, shard): greedy fixed-budget shard assignment —
    shard(d) = floor(exclusive_running_token_sum(d) / shard_tokens) in id
    order, so every shard holds ~shard_tokens tokens and the assignment
    is a pure function of the corpus (documents spanning a boundary start
    the next shard's budget; no shard exceeds budget + max_doc_tokens).
    The running sum is the two-stage scale-safe prefix sum — no
    single-partition window."""
    from networkit_spark.functions.text import token_count
    from networkit_spark.plans.ranking import prefix_sums

    toks = df.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    summed = prefix_sums(toks, "id", "n_tokens", lo_col="_lo", hi_col="_hi")
    return summed.select(
        "id",
        "n_tokens",
        F.floor(F.col("_lo") / F.lit(shard_tokens)).cast("long").alias("shard"),
    )


def importance_sample(
    df: DataFrame,
    weight_col: str = "score",
    id_col: str = "id",
    seed: int = 0,
    floor: float = 0.05,
) -> DataFrame:
    """(id, weight, accept_p, kept): DSIR-style quality-weighted Bernoulli
    resampling — accept each document with probability proportional to its
    quality/importance weight (e.g. a target-LM trigram score), smoothed so
    the worst document still keeps a `floor` chance (importance smoothing,
    keeps the sample's support full).

        p(d) = floor + (1 - floor) * (w(d) - min w) / (max w - min w)
        kept = LCG_priority(id, seed) < round(p, 6) * 2^31

    The min/max are two scalar aggregates broadcast back via a 1-row cross
    join (no shuffle of the corpus); acceptance is then a pure filter, the
    same scale shape as deterministic_sample. accept_p is ROUNDED to 6
    before the threshold compare so both engines threshold the identical
    double (CLAUDE.md rule 5). Degenerate corpus (max w = min w) accepts
    everything — p = 1.
    Training-pipeline op beyond the reference (round brief)."""
    w = df.select(
        F.col(id_col).alias("id"), F.col(weight_col).cast("double").alias("weight")
    )
    ext = w.agg(
        F.min("weight").alias("_wmin"), F.max("weight").alias("_wmax")
    )
    p = F.when(
        F.col("_wmax") == F.col("_wmin"), F.lit(1.0)
    ).otherwise(
        F.lit(floor)
        + (1.0 - floor)
        * (F.col("weight") - F.col("_wmin"))
        / (F.col("_wmax") - F.col("_wmin"))
    )
    return (
        w.crossJoin(F.broadcast(ext))
        .select("id", "weight", F.round(p, 6).alias("accept_p"))
        .withColumn(
            "kept",
            (
                lcg_priority(F.col("id"), seed)
                < F.col("accept_p") * F.lit(float(LCG_M))
            ).cast("long"),
        )
    )
