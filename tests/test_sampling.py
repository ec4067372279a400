"""functions/sampling.py vs pure-Python oracles: deterministic Bernoulli
sample, skew-safe stratified quota sample, fixed-budget shard packing."""

from networkit_spark.functions.sampling import (
    LCG_A,
    LCG_C,
    LCG_M,
    deterministic_sample,
    pack_shards,
    stratified_quota_sample,
)


def _pri(i, seed):
    return ((i + seed) % LCG_M * LCG_A + LCG_C) % LCG_M


def test_deterministic_sample(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    frac = 0.3
    got = sorted(r["doc_id"] for r in
                 deterministic_sample(df, frac, seed=7).collect())
    want = [i for i in range(200) if _pri(i, 7) < int(frac * LCG_M)]
    assert got == want
    assert 0 < len(got) < 200


def test_stratified_quota_sample_exact_topk(spark):
    # skewed strata: 'a' has 170 rows, 'b' 30 — quota must hold exactly
    rows = [(i, "a" if i < 170 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    k, seed = 5, 3
    out = stratified_quota_sample(df, ["lang"], k=k, seed=seed).collect()
    got = {}
    for r in out:
        got.setdefault(r["lang"], []).append(r["doc_id"])
    want = {}
    for lang, ids in (("a", range(170)), ("b", range(170, 200))):
        want[lang] = sorted(ids, key=lambda i: (_pri(i, seed), i))[:k]
    assert {l: sorted(v) for l, v in got.items()} == \
        {l: sorted(v) for l, v in want.items()}


def test_stratified_quota_small_stratum(spark):
    # stratum smaller than k returns the whole stratum
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, lang string"
    )
    out = stratified_quota_sample(df, ["lang"], k=10).collect()
    assert len(out) == 3


def test_sampling_plans_no_single_partition(spark):
    """Scale gate: neither op may plan a SinglePartition exchange —
    stratified sampling windows are salted; shard packing uses the
    two-stage prefix sum."""
    from pyspark.sql import functions as F

    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("lang"),
        F.lit("a b c d").alias("text"),
    )
    strat = stratified_quota_sample(df, ["lang"], k=3)
    plan = strat._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    packed = pack_shards(df, shard_tokens=100)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_pack_shards(spark):
    texts = [(0, "a b c"), (1, "d e"), (2, "f g h i"), (3, "j"), (4, "k l")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["id"]: (r["n_tokens"], r["shard"])
           for r in pack_shards(df, shard_tokens=4).collect()}
    # exclusive running sums in id order: 0,3,5,9,10 → shard = lo // 4
    assert got == {0: (3, 0), 1: (2, 0), 2: (4, 1), 3: (1, 2), 4: (2, 2)}
