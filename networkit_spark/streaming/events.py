"""GraphEvent streams — the dynamic-graph model (SURVEY §1.1).

Reference: GraphEvent (include/networkit/dynamics/GraphEvent.hpp:22-36) —
typed rows NODE_ADDITION, NODE_REMOVAL, NODE_RESTORATION, EDGE_ADDITION,
EDGE_REMOVAL, EDGE_WEIGHT_UPDATE, EDGE_WEIGHT_INCREMENT, TIME_STEP with
payload (u, v, w); applied in order by GraphUpdater::update
(dynamics/GraphUpdater.hpp:25) — GraphEventProxy
(dynamics/GraphEventProxy.cpp) is the same apply-and-forward contract,
which here is the fold + downstream Dyn-operator notification; DGS file
parsing (dynamics/DGSStreamParser.cpp); graphFromStream
(networkit/dynamic.py:6).

Spark mapping: events are rows (seq, type, u, v, w); TIME_STEP delimits
micro-batches. Batch application is a deterministic fold expressed as
window functions (last state per key wins); streaming ingestion is
Structured Streaming `readStream` → `foreachBatch(apply_events_batch)`
merging into the edge/vertex state store (Parquet dirs standing in for
Iceberg MERGE targets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from networkit_spark.graph import GraphDF

EVENT_TYPES = [
    "NODE_ADDITION",
    "NODE_REMOVAL",
    "NODE_RESTORATION",
    "EDGE_ADDITION",
    "EDGE_REMOVAL",
    "EDGE_WEIGHT_UPDATE",
    "EDGE_WEIGHT_INCREMENT",
    "TIME_STEP",
]

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),     # total order (file line / offset)
        T.StructField("type", T.StringType()),
        T.StructField("u", T.LongType()),
        T.StructField("v", T.LongType()),
        T.StructField("w", T.DoubleType()),
    ]
)


def events_from_list(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """rows: [(seq, type, u, v, w)] — tiny-fixture constructor."""
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def apply_events(
    graph: GraphDF, events: DataFrame
) -> GraphDF:
    """GraphUpdater::update semantics as a deterministic fold.

    Edge state: for each (u, v) key the LAST edge event by seq decides
    existence/weight, except WEIGHT_INCREMENT which accumulates onto the
    last ADDITION/UPDATE base. Node removals drop incident edges (the
    reference's removeNode requires prior edge removals; we apply the
    Iceberg-MERGE-friendly interpretation: a NODE_REMOVAL after an edge's
    last event hides the edge).

    Implemented with window functions over (u, v) — no driver loop, scales
    with event volume.
    """
    ev = events.filter(F.col("type") != "TIME_STEP")

    # ----- node set
    node_ev = ev.filter(
        F.col("type").isin("NODE_ADDITION", "NODE_REMOVAL", "NODE_RESTORATION")
    ).select("seq", "type", F.col("u").alias("id"))
    w_node = Window.partitionBy("id").orderBy(F.desc("seq"))
    node_last = (
        node_ev.withColumn("rn", F.row_number().over(w_node))
        .filter("rn = 1")
    )
    added = node_last.filter(
        F.col("type").isin("NODE_ADDITION", "NODE_RESTORATION")
    ).select("id")
    removed = node_last.filter(F.col("type") == "NODE_REMOVAL").select("id")
    vertices = graph.V.unionByName(added).distinct().join(
        removed, "id", "left_anti"
    )

    # ----- edge state (canonical key for undirected)
    edge_ev = ev.filter(F.col("type").startswith("EDGE_")).select(
        "seq",
        "type",
        (F.least("u", "v") if not graph.directed else F.col("u")).alias("src"),
        (F.greatest("u", "v") if not graph.directed else F.col("v")).alias("dst"),
        "w",
    )
    w_edge = Window.partitionBy("src", "dst").orderBy("seq")
    # running state via window fold: last non-increment event sets the base;
    # increments after it accumulate
    base_w = Window.partitionBy("src", "dst").orderBy(F.desc("seq"))
    last_base = (
        edge_ev.filter(F.col("type") != "EDGE_WEIGHT_INCREMENT")
        .withColumn("rn", F.row_number().over(base_w))
        .filter("rn = 1")
        .select("src", "dst", F.col("seq").alias("base_seq"), "type", F.col("w").alias("base_w"))
    )
    incs = (
        edge_ev.filter(F.col("type") == "EDGE_WEIGHT_INCREMENT")
        .join(last_base.select("src", "dst", "base_seq"), ["src", "dst"], "left")
        .filter(F.col("seq") > F.coalesce("base_seq", F.lit(-1)))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("inc_w"))
    )
    edge_state = (
        last_base.join(incs, ["src", "dst"], "left")
        .filter(F.col("type") != "EDGE_REMOVAL")
        .select(
            "src",
            "dst",
            (F.coalesce("base_w", F.lit(0.0)) + F.coalesce("inc_w", F.lit(0.0))).alias(
                "weight"
            ),
        )
    )
    # increments with no base event in this batch apply to the PRIOR graph
    # state (GraphUpdater applies increaseWeight to existing edges) — they
    # must not be dropped just because their EDGE_ADDITION landed in an
    # earlier micro-batch
    orphan_incs = incs.join(last_base, ["src", "dst"], "left_anti").select(
        "src", "dst", "inc_w"
    )
    removed_edges = last_base.filter(F.col("type") == "EDGE_REMOVAL").select(
        "src", "dst"
    )
    old_edges = graph.E
    if not graph.directed:
        old_edges = old_edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
    survivors = old_edges.join(
        edge_state.select("src", "dst"), ["src", "dst"], "left_anti"
    ).join(orphan_incs, ["src", "dst"], "left").select(
        "src",
        "dst",
        (F.col("weight") + F.coalesce("inc_w", F.lit(0.0))).alias("weight"),
    )
    merged = (
        survivors
        .unionByName(edge_state)
        .join(removed_edges, ["src", "dst"], "left_anti")
    )
    # drop edges touching removed nodes; keep only edges within vertex set
    merged = merged.join(
        vertices.withColumnRenamed("id", "src"), "src", "left_semi"
    ).join(vertices.withColumnRenamed("id", "dst"), "dst", "left_semi")
    return GraphDF(
        vertices, merged.select("src", "dst", "weight"),
        directed=graph.directed, weighted=True,
    )


def graph_from_events(
    spark: SparkSession, events: DataFrame, directed: bool = False
) -> GraphDF:
    """graphFromStream (networkit/dynamic.py:6): fold events onto the empty
    graph."""
    empty_v = spark.createDataFrame([], "id long")
    empty_e = spark.createDataFrame([], "src long, dst long, weight double")
    g = GraphDF(empty_v, empty_e, directed=directed, weighted=True)
    return apply_events(g, events)


# --------------------------------------------------------------- DGS I/O
def parse_dgs_lines(spark: SparkSession, df_lines: DataFrame) -> DataFrame:
    """DGSStreamParser (dynamics/DGSStreamParser.cpp) for the dialect the
    reference's own DGSWriter emits (dynamics/DGSWriter.cpp:20-52):
    `an <id>` / `dn <id>` / `rn <id>` (also the writer's space-less `rn<id>`)
    / `ae <u>-<v> <u> <v> [weight=]<w>` / `de <u>-<v>` /
    `ce <u>-<v> [weight=]<w>` / `ie <u>-<v> [weight=]<w>` / `st`
    → GraphEvent rows. Plain integer edge ids (the parser's eid-dict form)
    are accepted for `ae` (endpoints come from the explicit u v columns);
    `de`/`ce`/`ie` recover endpoints from the `u-v` eid. Header / comment
    lines parse to no event and are dropped. df_lines: (seq, value)."""
    t = F.trim(F.col("value"))
    v = F.split(t, r"\s+")
    op = v[0]
    eid_u = F.split(v[1], "-")[0].cast("long")
    eid_v = F.split(v[1], "-")[1].cast("long")
    has_pair = v[1].contains("-")
    wtok = lambda c: F.regexp_replace(c, "^weight=", "").cast("double")
    is_rn = t.rlike(r"^rn\s*\d+$")
    return df_lines.select(
        "seq",
        F.when(op == "an", "NODE_ADDITION")
        .when(op == "dn", "NODE_REMOVAL")
        .when(is_rn, "NODE_RESTORATION")
        .when(op == "ae", "EDGE_ADDITION")
        .when(op == "de", "EDGE_REMOVAL")
        .when(op == "ce", "EDGE_WEIGHT_UPDATE")
        .when(op == "ie", "EDGE_WEIGHT_INCREMENT")
        .when(op == "st", "TIME_STEP")
        .alias("type"),
        F.when(op.isin("an", "dn"), v[1].cast("long"))
        .when(is_rn, F.regexp_extract(t, r"^rn\s*(\d+)$", 1).cast("long"))
        .when(op == "ae", v[2].cast("long"))
        .when(op.isin("de", "ce", "ie") & has_pair, eid_u)
        .alias("u"),
        F.when(op == "ae", v[3].cast("long"))
        .when(op.isin("de", "ce", "ie") & has_pair, eid_v)
        .alias("v"),
        F.when(op == "ae", F.coalesce(wtok(v[4]), F.lit(1.0)))
        .when(op.isin("ce", "ie"), wtok(v[2]))
        .alias("w"),
    ).filter(F.col("type").isNotNull())


def dgs_lines_from_events(events: DataFrame) -> DataFrame:
    """DGSWriter (dynamics/DGSWriter.cpp:14-58): GraphEvent rows → DGS
    lines (seq, value), header included at seq -2/-1. One deliberate
    deviation: the reference writer emits `rn<id>` with the space missing
    (DGSWriter.cpp:30 — an upstream quirk); we emit `rn <id>` and
    parse_dgs_lines accepts both. Round-trips through parse_dgs_lines."""
    spark = events.sparkSession
    wfmt = F.format_string("%.6f", F.col("w").cast("double"))
    body = events.select(
        F.col("seq").cast("long").alias("seq"),
        F.when(F.col("type") == "NODE_ADDITION", F.concat_ws(" ", F.lit("an"), F.col("u")))
        .when(F.col("type") == "NODE_REMOVAL", F.concat_ws(" ", F.lit("dn"), F.col("u")))
        .when(F.col("type") == "NODE_RESTORATION", F.concat_ws(" ", F.lit("rn"), F.col("u")))
        .when(
            F.col("type") == "EDGE_ADDITION",
            F.concat_ws(
                " ",
                F.lit("ae"),
                F.concat_ws("-", F.col("u"), F.col("v")),
                F.col("u"),
                F.col("v"),
                F.concat(F.lit("weight="), wfmt),
            ),
        )
        .when(
            F.col("type") == "EDGE_REMOVAL",
            F.concat_ws(" ", F.lit("de"), F.concat_ws("-", F.col("u"), F.col("v"))),
        )
        .when(
            F.col("type") == "EDGE_WEIGHT_UPDATE",
            F.concat_ws(
                " ",
                F.lit("ce"),
                F.concat_ws("-", F.col("u"), F.col("v")),
                F.concat(F.lit("weight="), wfmt),
            ),
        )
        .when(
            F.col("type") == "EDGE_WEIGHT_INCREMENT",
            F.concat_ws(
                " ",
                F.lit("ie"),
                F.concat_ws("-", F.col("u"), F.col("v")),
                F.concat(F.lit("weight="), wfmt),
            ),
        )
        .when(F.col("type") == "TIME_STEP", F.lit("st"))
        .alias("value"),
    ).filter(F.col("value").isNotNull())
    header = spark.createDataFrame(
        [(-2, "DGS004"), (-1, "noname 0 0")], "seq long, value string"
    )
    return header.unionByName(body)


def write_dgs(events: DataFrame, path: str) -> None:
    """Write an event stream as a DGS text file (fixture-format tool —
    single partition for byte-stable goldens, like write_edge_list)."""
    (
        dgs_lines_from_events(events)
        .orderBy("seq")
        .select("value")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def stream_events_to_state(
    spark: SparkSession,
    events_stream: DataFrame,
    state_dir: str,
    directed: bool = False,
    checkpoint_dir: str | None = None,
):
    """Structured Streaming ingestion: readStream of GraphEvent rows →
    foreachBatch folds each micro-batch into the Parquet state store
    (vertices/ edges/ subdirs) — the Iceberg-MERGE pattern with a directory
    protocol. Returns the StreamingQuery."""
    import os

    def apply_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        v_path = os.path.join(state_dir, "vertices")
        e_path = os.path.join(state_dir, "edges")
        try:
            v = sp.read.parquet(v_path)
            e = sp.read.parquet(e_path)
            g = GraphDF(v, e, directed=directed, weighted=True)
        except Exception:
            g = GraphDF(
                sp.createDataFrame([], "id long"),
                sp.createDataFrame([], "src long, dst long, weight double"),
                directed=directed,
                weighted=True,
            )
        g2 = apply_events(g, batch_df)
        # stage-then-swap write (no Iceberg snapshot available): write to
        # tmp, then atomically move
        g2.V.write.mode("overwrite").parquet(v_path + ".tmp")
        g2.E.write.mode("overwrite").parquet(e_path + ".tmp")
        import shutil

        for p in (v_path, e_path):
            if os.path.exists(p):
                shutil.rmtree(p)
            os.rename(p + ".tmp", p)

    writer = (
        events_stream.writeStream.foreachBatch(apply_batch)
        .outputMode("update")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
