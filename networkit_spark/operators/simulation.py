"""EpidemicSimulationSEIR (reference: networkit/cpp/simulation/
EpidemicSimulationSEIR.cpp) — state-column superstep loop.

Node states S→E→I→R; per tick, susceptible nodes with ≥1 infectious
neighbor become exposed with probability pTrans (seeded hash — the run is
fully deterministic and parallelism-independent, unlike the reference's
RNG); exposed become infectious after tE ticks, infectious recover after
tI. Returns the per-tick state counts (the reference's output) plus the
final per-node state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF

S, E, I, R = 0, 1, 2, 3


def seir_simulation(
    graph: GraphDF,
    zero: list[int],
    p_trans: float = 0.5,
    t_exposed: int = 2,
    t_infectious: int = 4,
    ticks: int = 32,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Returns (timeline(tick, state, count), final(id, state))."""
    spark = graph.V.sparkSession
    e = graph.E_sym.filter("src != dst").select("src", "dst")
    e = e.repartition("src").sortWithinPartitions("src").persist()
    e.count()
    zero_df = spark.createDataFrame([(int(z),) for z in zero], "id long")
    state = graph.V.join(F.broadcast(zero_df), "id", "left_semi").select(
        "id", F.lit(I).alias("st"), F.lit(0).alias("since")
    )
    state = graph.V.join(state, "id", "left").select(
        "id",
        F.coalesce("st", F.lit(S)).alias("st"),
        F.coalesce("since", F.lit(0)).alias("since"),
    ).localCheckpoint(eager=True)

    thresh = int(p_trans * (1 << 40))
    timeline_rows = []
    for t in range(ticks):
        counts = state.groupBy("st").count().collect()
        for row in counts:
            timeline_rows.append((t, int(row["st"]), int(row["count"])))
        infectious = state.filter(F.col("st") == I).select(F.col("id").alias("src"))
        exposed_now = (
            e.join(infectious, "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .withColumn(
                "hit",
                F.pmod(F.abs(F.xxhash64("id", F.lit(seed), F.lit(t))), F.lit(1 << 40))
                < F.lit(thresh),
            )
            .filter("hit")
            .select("id")
        )
        new_state = (
            state.join(exposed_now.withColumn("exp", F.lit(1)), "id", "left")
            .select(
                "id",
                F.when((F.col("st") == S) & F.col("exp").isNotNull(), F.lit(E))
                .when(
                    (F.col("st") == E) & (F.col("since") + 1 >= t_exposed), F.lit(I)
                )
                .when(
                    (F.col("st") == I) & (F.col("since") + 1 >= t_infectious),
                    F.lit(R),
                )
                .otherwise(F.col("st"))
                .alias("new_st"),
                "st",
                "since",
            )
            .select(
                "id",
                F.col("new_st").alias("st"),
                F.when(F.col("new_st") != F.col("st"), F.lit(0))
                .otherwise(F.col("since") + 1)
                .alias("since"),
            )
        ).localCheckpoint(eager=True)
        state = new_state
    e.unpersist()
    timeline = spark.createDataFrame(
        timeline_rows, "tick int, state int, count long"
    )
    return timeline, state.select("id", "st")
