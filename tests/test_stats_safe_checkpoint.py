"""stats_safe_checkpoint — regression pin for CLAUDE.md rule 16.

Catalyst multiplies sizeInBytes across join trees and a bare
localCheckpoint's LogicalRDD preserves the origin plan's stats, so
level-on-level join loops compound the estimate super-exponentially
(measured to a driver OOM in the PGA clusterer). This test simulates
the loop shape and asserts the safe checkpoint keeps the estimate at
the real cached size while the bare checkpoint visibly compounds.
"""

from pyspark.sql import functions as F

from networkit_spark.plans.checkpoint import stats_safe_checkpoint


def _size_digits(df):
    s = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    return len(str(s))


def _level(df):
    # the vulnerable shape: the next level joins the previous one THREE
    # ways (like a coarsening step joining V, degrees, and a mapping)
    a = df.select(F.col("id"), F.col("v").alias("va"))
    b = df.select(F.col("id"), F.col("v").alias("vb"))
    c = df.select(F.col("id"), F.col("v").alias("vc"))
    return (
        a.join(b, "id").join(c, "id")
        .select("id", (F.col("va") + F.col("vb") + F.col("vc")).alias("v"))
    )


def test_bare_checkpoint_compounds_stats(spark):
    df = spark.range(100).select("id", F.col("id").alias("v"))
    bare = df
    for _ in range(3):
        bare = _level(bare).localCheckpoint(eager=True)
    safe = df
    for _ in range(3):
        safe = stats_safe_checkpoint(_level(safe))
    # identical data either way
    assert sorted(r["v"] for r in safe.collect()) == sorted(
        r["v"] for r in bare.collect()
    )
    # the safe path's estimate stays a real (small) size; the bare path
    # compounds well beyond any physical plausibility for 100 rows
    assert _size_digits(safe) <= 8
    assert _size_digits(bare) > _size_digits(safe)


def test_safe_checkpoint_truncates_lineage(spark):
    df = spark.range(10).select("id", F.col("id").alias("v"))
    out = stats_safe_checkpoint(_level(df))
    # plan is a scan of the checkpointed RDD, not the join pipeline
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    assert out.count() == 10
