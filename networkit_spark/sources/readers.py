"""Graph file readers/writers (SURVEY §2.1; reference: networkit/cpp/io/*,
dispatch networkit/graphio.pyx:724-786).

Text formats map to spark.read.csv/text with declarative parsing; the
"binary format" of this engine is Parquet itself (NetworkitBinary's
chunked layout ≡ row groups — io/NetworkitBinaryGraph.md). Writers emit
canonically ordered output for byte-stable golden files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF
from networkit_spark.plans.ranking import global_row_numbers


def read_edge_list(
    spark: SparkSession,
    path: str,
    separator: str = "\t",
    comment_prefix: str = "#",
    first_node: int = 0,
    continuous: bool = True,
    directed: bool = False,
    weighted: bool = False,
) -> GraphDF:
    """EdgeListReader (networkit/cpp/io/EdgeListReader.cpp:20-124):
    configurable separator, id base offset, comment prefix; when
    `continuous=False`, string keys are mapped to dense ids via dense_rank
    over sorted keys (the EdgeListReader::getNodeMap analog,
    EdgeListReader.cpp:25-30)."""
    df = spark.read.csv(path, sep=separator, comment=comment_prefix or None)
    cols = df.columns
    if continuous:
        e = df.select(
            (F.col(cols[0]).cast("long") - first_node).alias("src"),
            (F.col(cols[1]).cast("long") - first_node).alias("dst"),
            (
                F.col(cols[2]).cast("double")
                if weighted and len(cols) > 2
                else F.lit(1.0)
            ).alias("weight"),
        )
        return GraphDF.from_edges(e, directed=directed, weighted=weighted)
    # string keys → minted ids (two-stage scale-safe rank, no single-
    # partition window — plans/ranking.py)
    keys = (
        df.select(F.col(cols[0]).alias("k"))
        .union(df.select(F.col(cols[1]).alias("k")))
        .distinct()
    )
    mapping = global_row_numbers(keys, ["k"], out_col="id")
    e = (
        df.join(mapping.select(F.col("k").alias(cols[0]), F.col("id").alias("src")), cols[0])
        .join(mapping.select(F.col("k").alias(cols[1]), F.col("id").alias("dst")), cols[1])
        .select(
            "src",
            "dst",
            (
                F.col(cols[2]).cast("double")
                if weighted and len(cols) > 2
                else F.lit(1.0)
            ).alias("weight"),
        )
    )
    return GraphDF.from_edges(e, directed=directed, weighted=weighted)


def read_snap(
    spark: SparkSession, path: str, directed: bool = True, remap: bool = True
) -> GraphDF:
    """SNAPGraphReader (networkit/cpp/io/SNAPGraphReader.cpp:18-60):
    whitespace edge list, '#' comments, optional remap to consecutive ids,
    duplicate edges silently deduped (:27-41)."""
    df = (
        spark.read.text(path)
        .filter(~F.col("value").startswith("#"))
        .filter(F.length(F.trim("value")) > 0)
        .select(F.split(F.trim("value"), r"\s+").alias("p"))
        .select(
            F.col("p")[0].cast("long").alias("raw_src"),
            F.col("p")[1].cast("long").alias("raw_dst"),
        )
        .dropDuplicates(["raw_src", "raw_dst"])
    )
    if not remap:
        e = df.select(
            F.col("raw_src").alias("src"),
            F.col("raw_dst").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
        return GraphDF.from_edges(e, directed=directed)
    keys = (
        df.select(F.col("raw_src").alias("k"))
        .union(df.select(F.col("raw_dst").alias("k")))
        .distinct()
    )
    mapping = global_row_numbers(keys, ["k"], out_col="id")
    e = (
        df.join(mapping.select(F.col("k").alias("raw_src"), F.col("id").alias("src")), "raw_src")
        .join(mapping.select(F.col("k").alias("raw_dst"), F.col("id").alias("dst")), "raw_dst")
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    return GraphDF.from_edges(e, directed=directed)


def read_metis(spark: SparkSession, path: str) -> GraphDF:
    """METISGraphReader (networkit/cpp/io/METISGraphReader.cpp): 1-based
    adjacency lines, header `n m [fmt]`; line number = node id. Implemented
    with zipWithIndex-free row_number over a monotonic file order column."""
    lines = (
        spark.read.text(path)
        .select(F.monotonically_increasing_id().alias("mono"), "value")
    )
    # stable line numbering within a single file read — two-stage
    # scale-safe rank, no single-partition window
    lines = global_row_numbers(lines, ["mono"], out_col="ln")
    header = lines.filter("ln = 0").collect()[0]["value"].split()
    n = int(header[0])
    body = lines.filter(F.col("ln") >= 1).select(
        (F.col("ln") - 1).alias("src"),
        F.split(F.trim("value"), r"\s+").alias("nbrs"),
    )
    e = (
        body.select("src", F.explode("nbrs").alias("nbr"))
        .filter(F.length("nbr") > 0)
        .select("src", (F.col("nbr").cast("long") - 1).alias("dst"))
        .filter(F.col("src") < F.col("dst"))  # each undirected edge listed twice
        .withColumn("weight", F.lit(1.0))
    )
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e, directed=False, vertices=v)


def write_edge_list(
    graph: GraphDF, path: str, separator: str = "\t"
) -> None:
    """EdgeListWriter: canonical (src, dst) ordering for byte-stable
    goldens; single partition for file-level determinism (use the parquet
    writer for scale)."""
    (
        graph.E.orderBy("src", "dst")
        .select(
            F.concat_ws(
                separator,
                F.col("src").cast("string"),
                F.col("dst").cast("string"),
                F.col("weight").cast("string"),
            ).alias("value")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_lfr(
    spark: SparkSession, network_path: str, community_path: str
) -> tuple[GraphDF, DataFrame]:
    """LFR benchmark fixture pair (the reference's LFRGenerator test inputs
    `input/network.dat` + `input/community.dat`,
    test/LFRGeneratorGTest.cpp): network.dat lists every undirected edge
    twice as 1-based `u v`; community.dat is 1-based `node community`.
    Returns (graph, planted_partition(id, label)) with 0-based ids — the
    same shape sources/generators.lfr produces, so NMI against a detected
    partition works on either."""
    raw = spark.read.csv(network_path, sep="\t", comment="#")
    cols = raw.columns
    e = (
        raw.select(
            (F.col(cols[0]).cast("long") - 1).alias("src"),
            (F.col(cols[1]).cast("long") - 1).alias("dst"),
        )
        .filter(F.col("src") < F.col("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    g = GraphDF.from_edges(e, directed=False)
    c = spark.read.csv(community_path, sep="\t", comment="#")
    ccols = c.columns
    part = c.select(
        (F.col(ccols[0]).cast("long") - 1).alias("id"),
        F.col(ccols[1]).cast("long").alias("label"),
    )
    return g, part


def write_metis(graph: GraphDF, path: str, weighted: bool | None = None) -> None:
    """METISGraphWriter (io/METISGraphWriter.cpp:20-66): header `n m w`,
    then line i = the 1-based neighbors of node i (every undirected edge
    appears in both endpoint lines); weighted dialect emits `nbr w` pairs.
    Directed graphs are rejected like the reference. Ids are remapped to a
    continuous [0,n) space first (the reference's getContinuousNodeIds
    branch). Adjacency lines are built distributively (per-node groupBy of
    sorted neighbor structs); only the final file sink is single-stream —
    line-format sinks are fixture-tier by definition (write_parquet is the
    scale sink)."""
    if graph.directed:
        raise ValueError("METIS does not support directed graphs")
    if weighted is None:
        weighted = graph.weighted
    g, mapping = graph.compact_node_ids()
    n = g.V.count()
    m = g.E.count()
    nb = g.E_sym.filter("src != dst").select("src", "dst", "weight")
    if weighted:
        tok = F.concat_ws(
            " ", (F.col("dst") + 1).cast("string"), F.col("weight").cast("string")
        )
        sep = "\t"
    else:
        tok = (F.col("dst") + 1).cast("string")
        sep = " "
    adj = nb.groupBy("src").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dst", tok.alias("tok")))),
                lambda s: s["tok"],
            ),
            sep,
        ).alias("line")
    )
    body = (
        g.V.join(adj, g.V.id == adj.src, "left")
        .select(
            (F.col("id") + 1).alias("ord"),
            F.coalesce("line", F.lit("")).alias("value"),
        )
    )
    header = body.sparkSession.createDataFrame(
        [(0, f"{n} {m} {int(bool(weighted))}")], "ord long, value string"
    )
    (
        header.unionByName(body)
        .orderBy("ord")
        .select("value")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def write_snap(graph: GraphDF, path: str) -> None:
    """SNAPGraphWriter (io/SNAPGraphWriter.cpp:15-27): problem line
    `p n m u u 0` followed by one `u v` line per edge."""
    n = graph.V.count()
    m = graph.E.count()
    body = graph.E.select(
        F.lit(1).alias("ord"),
        F.col("src").cast("long").alias("s"),
        F.col("dst").cast("long").alias("d"),
        F.concat_ws(
            " ", F.col("src").cast("string"), F.col("dst").cast("string")
        ).alias("value"),
    )
    header = body.sparkSession.createDataFrame(
        [(0, -1, -1, f"p {n} {m} u u 0")], "ord int, s long, d long, value string"
    )
    (
        header.unionByName(body)
        .orderBy("ord", "s", "d")
        .select("value")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def write_parquet(graph: GraphDF, path: str) -> None:
    """The engine's native binary sink (NetworkitBinary ≡ parquet row
    groups): edges partitioned and sorted for co-located reads."""
    graph.E.repartition("src").sortWithinPartitions("src", "dst").write.mode(
        "overwrite"
    ).parquet(f"{path}/edges")
    graph.V.write.mode("overwrite").parquet(f"{path}/vertices")


def read_parquet(
    spark: SparkSession, path: str, directed: bool = False, weighted: bool = True
) -> GraphDF:
    return GraphDF(
        spark.read.parquet(f"{path}/vertices"),
        spark.read.parquet(f"{path}/edges"),
        directed=directed,
        weighted=weighted,
    )


def read_partition(spark: SparkSession, path: str) -> DataFrame:
    """PartitionReader (io/PartitionReader.cpp): line i = label of node i."""
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("mono"), "value"
    )
    return (
        global_row_numbers(lines, ["mono"], out_col="id")
        .select(
            F.col("id").cast("long").alias("id"),
            F.col("value").cast("long").alias("label"),
        )
    )


def read_edgelist_partition(
    spark: SparkSession, path: str, first_node: int = 1, sep: str = " "
) -> DataFrame:
    """EdgeListPartitionReader (io/EdgeListPartitionReader.cpp:15-42):
    lines `<node><sep><subset>`, node ids shifted down by `first_node`,
    '#' lines skipped. Returns (id, label)."""
    lines = spark.read.text(path)
    toks = F.split(F.trim("value"), sep)
    return (
        lines.filter(~F.col("value").startswith("#"))
        .filter(F.trim("value") != "")
        .select(
            (toks[0].cast("long") - F.lit(first_node)).alias("id"),
            toks[1].cast("long").alias("label"),
        )
    )


def write_partition(partition: DataFrame, path: str) -> None:
    """PartitionWriter: label per line in node-id order."""
    (
        partition.orderBy("id")
        .select(F.col("label").cast("string").alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_edgelist_cover(
    spark: SparkSession, path: str, first_node: int = 1
) -> DataFrame:
    """EdgeListCoverReader (io/EdgeListCoverReader.cpp:14-49): each line is
    `<node> <subset> [<subset> ...]` — the node id shifted down by
    `first_node`, subset ids taken verbatim; '#' comment lines skipped.
    Returns the cover as (id, subset) rows, one per membership — the
    explode is per-line, so the scan parallelizes over file splits."""
    lines = spark.read.text(path)
    toks = F.split(F.trim("value"), r"\s+")
    return (
        lines.filter(~F.col("value").startswith("#"))
        .filter(F.trim("value") != "")
        .select(
            (toks[0].cast("long") - F.lit(first_node)).alias("id"),
            F.explode(F.slice(toks, 2, 1 << 20)).alias("s"),
        )
        .select("id", F.col("s").cast("long").alias("subset"))
    )


def read_cover(spark: SparkSession, path: str) -> DataFrame:
    """CoverReader (io/CoverReader.cpp:10-30): line i lists the member node
    ids of community i; '#' lines are comments. Returns the Cover as
    (id: long, subset: long) — one row per membership (overlapping)."""
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("mono"), "value"
    )
    numbered = global_row_numbers(
        lines.filter(~F.col("value").startswith("#")), ["mono"],
        out_col="subset",
    ).withColumn("subset", F.col("subset").cast("long"))
    return (
        numbered.select(
            "subset",
            F.explode(F.split(F.trim("value"), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(F.col("tok").cast("long").alias("id"), "subset")
    )


def write_cover(cover: DataFrame, path: str) -> None:
    """CoverWriter (io/CoverWriter.cpp): line per community, space-separated
    member ids in ascending order, communities in subset-id order."""
    (
        cover.groupBy("subset")
        .agg(F.array_join(F.array_sort(F.collect_list("id")), " ").alias("value"))
        .orderBy("subset")
        .select("value")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_konect(
    spark: SparkSession,
    path: str,
    multiple_edges: str = "discard",
) -> GraphDF:
    """KONECTGraphReader (io/KONECTGraphReader.cpp): '%'-comment header
    declares directedness/weighting ('% sym|asym [weighted|unweighted]');
    body is whitespace-separated src dst [weight]. `multiple_edges` ∈
    {'discard', 'sum', 'min'} per MultipleEdgesHandling
    (KONECTGraphReader.hpp:22). KONECT ids are 1-based."""
    raw = spark.read.text(path)
    header = (
        raw.filter(F.col("value").startswith("%")).limit(1).collect()
    )
    h = header[0]["value"].lower() if header else "% sym unweighted"
    directed = "asym" in h
    weighted = "unweighted" not in h and ("weighted" in h or "positive" in h)
    body = raw.filter(~F.col("value").startswith("%")).filter(
        F.trim("value") != ""
    )
    toks = body.select(F.split(F.trim("value"), r"\s+").alias("t"))
    e = toks.select(
        (F.col("t")[0].cast("long") - 1).alias("src"),
        (F.col("t")[1].cast("long") - 1).alias("dst"),
        F.coalesce(F.col("t")[2].cast("double"), F.lit(1.0)).alias("weight"),
    )
    g = GraphDF.from_edges(e, directed=directed, weighted=weighted)
    return g.remove_multi_edges(mode=multiple_edges)


def read_gml(spark: SparkSession, path: str) -> GraphDF:
    """GMLGraphReader (io/GMLGraphReader.cpp:21-130, restricted GML
    subset): `node [ id K ]` blocks then `edge [ source K target K ]`
    blocks inside `graph [ ... ]`; `directed 1` flags direction. The
    reference remaps each file key to the node's INSERTION ORDER
    (G.addNode() per node block) — reproduced here by numbering node
    blocks by document position.

    Parse is columnar: wholetext read → regexp_extract_all block lists →
    posexplode → per-block regexp_extract. One task for the regex pass
    (fixture-format ingest tool, like read_metis); everything downstream
    is a distributed DataFrame."""
    raw = spark.read.text(path, wholetext=True)
    directed = bool(
        raw.select(
            (F.regexp_extract("value", r"directed\s+(\d+)", 1) == "1").alias("d")
        ).head()["d"]
    )
    nodes = (
        raw.select(
            F.posexplode(
                F.regexp_extract_all("value", F.lit(r"node\s*\[([^\]]*)\]"), F.lit(1))
            ).alias("ord", "blk")
        )
        .select(
            F.col("ord").cast("long").alias("id"),
            F.regexp_extract("blk", r"id\s+(\S+)", 1).alias("key"),
        )
    )
    edges_raw = raw.select(
        F.explode(
            F.regexp_extract_all("value", F.lit(r"edge\s*\[([^\]]*)\]"), F.lit(1))
        ).alias("blk")
    ).select(
        F.regexp_extract("blk", r"source\s+(\S+)", 1).alias("skey"),
        F.regexp_extract("blk", r"target\s+(\S+)", 1).alias("tkey"),
    )
    e = (
        edges_raw.join(
            nodes.select(F.col("key").alias("skey"), F.col("id").alias("src")), "skey"
        )
        .join(
            nodes.select(F.col("key").alias("tkey"), F.col("id").alias("dst")), "tkey"
        )
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    v = nodes.select("id")
    return GraphDF.from_edges(e, directed=directed, vertices=v)


def write_gml(graph: GraphDF, path: str) -> None:
    """GMLGraphWriter (io/GMLGraphWriter.cpp:17-39): `graph [`, optional
    `directed 1`, one `node [ id u ]` block per node, one
    `edge [ source u target v ]` block per edge, `]`. Canonical node/edge
    order for byte-stable goldens; single-stream sink like the other
    line-format writers (write_parquet is the scale sink)."""
    node_lines = graph.V.orderBy("id").select(
        F.lit(1).alias("ord"),
        F.col("id").cast("long").alias("k1"),
        F.lit(0).cast("long").alias("k2"),
        F.concat(
            F.lit("  node [\n    id "), F.col("id").cast("string"), F.lit("\n  ]")
        ).alias("value"),
    )
    edge_lines = graph.E.orderBy("src", "dst").select(
        F.lit(2).alias("ord"),
        F.col("src").cast("long").alias("k1"),
        F.col("dst").cast("long").alias("k2"),
        F.concat(
            F.lit("  edge [\n    source "),
            F.col("src").cast("string"),
            F.lit("\n    target "),
            F.col("dst").cast("string"),
            F.lit("\n  ]"),
        ).alias("value"),
    )
    spark = graph.V.sparkSession
    head = [(0, 0, 0, "graph [")]
    if graph.directed:
        head.append((0, 0, 1, "  directed 1"))
    frame = spark.createDataFrame(
        head + [(3, 0, 0, "]")], "ord int, k1 long, k2 long, value string"
    )
    (
        frame.unionByName(node_lines)
        .unionByName(edge_lines)
        .orderBy("ord", "k1", "k2")
        .select("value")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def write_dot(graph: GraphDF, path: str) -> None:
    """DotGraphWriter (io/DotGraphWriter.cpp:14-23): `graph {` +
    `u -- v;` per edge + `}` (directed variant: `digraph` / `->`,
    the graphviz dialect the reference's Python layer emits)."""
    arrow = " -> " if graph.directed else " -- "
    head = "digraph {" if graph.directed else "graph {"
    body = graph.E.orderBy("src", "dst").select(
        F.lit(1).alias("ord"),
        F.col("src").cast("long").alias("k1"),
        F.col("dst").cast("long").alias("k2"),
        F.concat(
            F.col("src").cast("string"),
            F.lit(arrow),
            F.col("dst").cast("string"),
            F.lit(";"),
        ).alias("value"),
    )
    spark = graph.V.sparkSession
    frame = spark.createDataFrame(
        [(0, 0, 0, head), (2, 0, 0, "}")], "ord int, k1 long, k2 long, value string"
    )
    (
        frame.unionByName(body)
        .orderBy("ord", "k1", "k2")
        .select("value")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_matrix_market(spark: SparkSession, path: str) -> GraphDF:
    """MatrixMarketReader (io/MatrixMarketReader.cpp:36-120): header
    `%%MatrixMarket matrix coordinate real|pattern general|symmetric`,
    %-comments, a `nrows ncols nnz` size line, then 1-based
    `i j [value]` entries. `symmetric` → undirected graph, `general` →
    directed; `pattern` → weight 1.0. Returned as a GraphDF over the
    0-based (i-1, j-1) adjacency (the reference materializes a CSRMatrix
    — our matrix ≡ edge DataFrame). Size line = the first non-comment
    line, dropped by file position (narrow scan, no shuffle)."""
    first = spark.read.text(path).head()["value"].strip().lower().split()
    if not first or first[0] != "%%matrixmarket":
        raise ValueError("%%MatrixMarket header not found")
    if first[2] != "coordinate":
        raise ValueError(f"Unsupported format: {first[2]}")
    data_kind = first[3]
    if data_kind not in ("real", "pattern", "integer"):
        raise ValueError(f"Unsupported data type: {data_kind}")
    weighted = data_kind != "pattern"
    symmetric = len(first) > 4 and first[4] == "symmetric"

    lines_pos = (
        spark.read.text(path)
        .select(F.monotonically_increasing_id().alias("_pos"), "value")
        .filter(~F.col("value").startswith("%"))
        .filter(F.trim("value") != "")
    )
    min_pos = lines_pos.agg(F.min("_pos").alias("m")).head()["m"]
    body = lines_pos.filter(F.col("_pos") != min_pos).select(
        F.split(F.trim("value"), r"\s+").alias("t")
    )
    e = body.select(
        (F.element_at("t", 1).cast("long") - 1).alias("src"),
        (F.element_at("t", 2).cast("long") - 1).alias("dst"),
        (
            F.element_at("t", 3).cast("double") if weighted else F.lit(1.0)
        ).alias("weight"),
    )
    return GraphDF.from_edges(
        e, directed=not symmetric, weighted=weighted
    )


def _gt_width(n: int) -> int:
    if n < 1 << 8:
        return 1
    if n < 1 << 16:
        return 2
    if n < 1 << 32:
        return 4
    return 8


def read_graphtool(spark: SparkSession, path: str) -> GraphDF:
    """GraphToolBinaryReader (io/GraphToolBinaryReader.cpp:14-110): magic
    `e2 9b be 20 67 74`, version 0x01, endianness byte, u64-length comment,
    directed byte, u64 n, then per node a u64 out-degree + width-byte
    neighbor ids (width = 1/2/4/8 by n). Undirected files store each edge
    once, in the LARGER endpoint's list (the writer's v <= u rule).

    The format is a single sequential binary stream, so the parse is a
    driver-side codec (fixture-tier ingest like the reference's own
    ifstream loop); the resulting edge table is distributed."""
    with open(path, "rb") as f:
        head = f.read(8)
        if head[:6] != b"\xe2\x9b\xbe\x20\x67\x74" or head[6] != 0x01:
            raise ValueError("GraphTool header is broken")
        if head[7] not in (0x00, 0x01):
            raise ValueError("GraphTool header is broken")
        bo = "little" if head[7] == 0x00 else "big"
        clen = int.from_bytes(f.read(8), bo)
        f.read(clen)  # comment
        directed = f.read(1) != b"\x00"
        n = int.from_bytes(f.read(8), bo)
        width = _gt_width(n)
        edges = []
        for u in range(n):
            deg = int.from_bytes(f.read(8), bo)
            if deg:
                blob = f.read(deg * width)
                for i in range(deg):
                    v = int.from_bytes(blob[i * width : (i + 1) * width], bo)
                    edges.append((u, v, 1.0))
    e = spark.createDataFrame(edges or [], "src long, dst long, weight double")
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e, directed=directed, vertices=v)


def write_graphtool(graph: GraphDF, path: str) -> None:
    """GraphToolBinaryWriter (io/GraphToolBinaryWriter.cpp:18-85): same
    layout, little-endian, empty comment; undirected edges land in the
    larger endpoint's adjacency (v <= u), directed write full out-lists.
    Ids are compacted to [0, n) first (the reference's getContinuousNodeIds
    branch). Single-file binary sink — fixture-tier by definition."""
    g, _ = graph.compact_node_ids()
    n = g.V.count()
    width = _gt_width(n)
    if graph.directed:
        rows = g.E.select("src", "dst")
    else:
        # canonical storage is src <= dst; the format wants the edge in the
        # larger endpoint's list
        rows = g.E.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    adj: dict[int, list[int]] = {}
    for r in rows.orderBy("src", "dst").collect():
        adj.setdefault(r["src"], []).append(r["dst"])
    with open(path, "wb") as f:
        f.write(b"\xe2\x9b\xbe\x20\x67\x74\x01\x00")
        f.write((0).to_bytes(8, "little"))  # empty comment
        f.write(b"\x01" if graph.directed else b"\x00")
        f.write(int(n).to_bytes(8, "little"))
        for u in range(n):
            nb = adj.get(u, [])
            f.write(len(nb).to_bytes(8, "little"))
            for v in nb:
                f.write(int(v).to_bytes(width, "little"))


def read_thrill(spark: SparkSession, path: str) -> GraphDF:
    """ThrillGraphBinaryReader (io/ThrillGraphBinaryReader.cpp:10-90):
    per node a varint64 degree followed by u32-little-endian neighbor ids;
    undirected, each edge stored once in the SMALLER endpoint's list
    (ThrillGraphBinaryWriter's u <= v rule). Driver-side codec like
    read_graphtool."""
    edges = []
    with open(path, "rb") as f:
        data = f.read()
    pos, u, max_id = 0, 0, -1
    ln = len(data)
    while pos < ln:
        deg, shift = 0, 0
        while True:
            b = data[pos]
            pos += 1
            deg |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift >= 64:
                raise ValueError("Overflow during variant64 decoding")
        for _ in range(deg):
            v = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
            edges.append((u, v, 1.0))
            max_id = max(max_id, v)
        max_id = max(max_id, u)
        u += 1
    n = max(u, max_id + 1)
    e = spark.createDataFrame(edges or [], "src long, dst long, weight double")
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e, directed=False, vertices=v)


def write_thrill(graph: GraphDF, path: str) -> None:
    """ThrillGraphBinaryWriter (io/ThrillGraphBinaryWriter.cpp:14-55):
    varint64 degree + u32-LE neighbors, edge in the smaller endpoint's
    list; rejects graphs over 2^32-1 nodes like the reference."""
    if graph.directed:
        raise ValueError("Thrill binary graphs are undirected")
    g, _ = graph.compact_node_ids()
    n = g.V.count()
    if n > (1 << 32) - 1:
        raise ValueError(
            "Thrill binary graphs only support graphs with up to 2^32-1 nodes."
        )
    adj: dict[int, list[int]] = {}
    # canonical src <= dst already matches the smaller-endpoint rule
    for r in g.E.orderBy("src", "dst").collect():
        adj.setdefault(r["src"], []).append(r["dst"])
    with open(path, "wb") as f:
        for u in range(n):
            nb = adj.get(u, [])
            deg = len(nb)
            if not deg:
                f.write(b"\x00")
            while deg:
                lo = deg & 0x7F
                deg >>= 7
                f.write(bytes([lo | (0x80 if deg else 0)]))
            for v in nb:
                f.write(int(v).to_bytes(4, "little"))


def read_binary_partition(
    spark: SparkSession, path: str, width: int = 8
) -> DataFrame:
    """BinaryPartitionReader (io/BinaryPartitionReader.cpp:13-45): a flat
    little-endian array of `width`-byte subset ids, position = node id;
    width must be 4 or 8 like the reference. Driver-side codec → (id,
    label) DataFrame."""
    if width not in (4, 8):
        raise ValueError("Only 4 and 8 are supported widths")
    with open(path, "rb") as f:
        data = f.read()
    if len(data) % width != 0:
        raise ValueError("length of partition file must be a multiple of the width")
    rows = [
        (u, int.from_bytes(data[u * width : (u + 1) * width], "little"))
        for u in range(len(data) // width)
    ]
    return spark.createDataFrame(rows or [], "id long, label long")


def write_binary_partition(
    partition: DataFrame, path: str, width: int = 8
) -> None:
    """BinaryPartitionWriter (io/BinaryPartitionWriter.cpp:13-31): same
    flat layout; width-4 rejects labels over 2^32-1 like the reference."""
    if width not in (4, 8):
        raise ValueError("Only width 4 and 8 are supported")
    rows = partition.select("id", "label").orderBy("id").collect()
    with open(path, "wb") as f:
        for i, r in enumerate(rows):
            if r["id"] != i:
                raise ValueError("partition ids must be continuous [0, n)")
            p = int(r["label"])
            if width == 4 and p > (1 << 32) - 1:
                raise ValueError(
                    "label cannot be represented in width 4; use width 8"
                )
            f.write(p.to_bytes(width, "little"))


def read_binary_edgelist_partition(
    spark: SparkSession, path: str, first_node: int = 0, width: int = 8
) -> DataFrame:
    """BinaryEdgeListPartitionReader (io/BinaryEdgeListPartitionReader.cpp:
    13-80): little-endian (node, subset) PAIRS of `width`-byte ints with a
    firstNode offset."""
    if width not in (4, 8):
        raise ValueError("width must be 4 or 8")
    with open(path, "rb") as f:
        data = f.read()
    if len(data) % (2 * width) != 0:
        raise ValueError("file must hold (node, partition) pairs")
    rows = []
    for off in range(0, len(data), 2 * width):
        u = int.from_bytes(data[off : off + width], "little") - first_node
        p = int.from_bytes(data[off + width : off + 2 * width], "little")
        rows.append((u, p))
    return spark.createDataFrame(rows or [], "id long, label long")


def write_binary_edgelist_partition(
    partition: DataFrame, path: str, first_node: int = 0, width: int = 8
) -> None:
    """BinaryEdgeListPartitionWriter (io/BinaryEdgeListPartitionWriter.cpp):
    the pair-layout twin of write_binary_partition."""
    if width not in (4, 8):
        raise ValueError("width must be 4 or 8")
    rows = partition.select("id", "label").orderBy("id").collect()
    with open(path, "wb") as f:
        for r in rows:
            f.write((int(r["id"]) + first_node).to_bytes(width, "little"))
            f.write(int(r["label"]).to_bytes(width, "little"))


def write_dot_partition(
    graph: GraphDF, partition: DataFrame, path: str
) -> None:
    """DotPartitionWriter (io/DotPartitionWriter.cpp:8-52): graphviz with
    filled nodes colored by an evenly spaced hue per non-isolated cluster
    (hue = idx / #clusters in cluster-id order) and `u -- v;` edges;
    isolated nodes are skipped like the reference. Node/edge lines are
    built distributively; single-stream text sink (fixture-tier)."""
    deg = (
        graph.E_sym.filter("src != dst")
        .select(F.col("src").alias("id"))
        .union(graph.E.filter("src = dst").select(F.col("src").alias("id")))
        .distinct()
    )
    active = partition.join(deg, "id")
    hues = (
        active.select("label")
        .distinct()
        .orderBy("label")
        .collect()
    )  # cluster METADATA, not data
    factor = 1.0 / max(len(hues), 1)
    hue_df = F.broadcast(
        graph.V.sparkSession.createDataFrame(
            [(r["label"], i * factor) for i, r in enumerate(hues)],
            "label long, hue double",
        )
    )
    node_lines = active.join(hue_df, "label").select(
        F.lit(1).alias("ord"),
        F.col("id").alias("k1"),
        F.lit(0).cast("long").alias("k2"),
        F.concat(
            F.col("id").cast("string"),
            F.lit(' [style=filled, color="'),
            F.col("hue").cast("string"),
            F.lit(',0.99,0.99", label='),
            F.col("label").cast("string"),
            F.lit("];"),
        ).alias("value"),
    )
    edge_lines = graph.E.orderBy("src", "dst").select(
        F.lit(2).alias("ord"),
        F.col("src").alias("k1"),
        F.col("dst").alias("k2"),
        F.concat(
            F.col("src").cast("string"),
            F.lit(" -- "),
            F.col("dst").cast("string"),
            F.lit(";"),
        ).alias("value"),
    )
    spark = graph.V.sparkSession
    frame = spark.createDataFrame(
        [(0, 0, 0, "graph {"), (3, 0, 0, "}")],
        "ord int, k1 long, k2 long, value string",
    )
    (
        frame.unionByName(node_lines)
        .unionByName(edge_lines)
        .orderBy("ord", "k1", "k2")
        .select("value")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_dibap(spark: SparkSession, path: str) -> GraphDF:
    """DibapGraphReader (io/DibapGraphReader.cpp:34-180): DibaP binary —
    big-endian short magic 'GI', int V, vertex-weight dim + weights,
    CSR offsets of[V+1] and targets to[numE2], edge-weight dim + int
    weights, coordinate dim + float coords. Each undirected edge is kept
    from the v <= to[e] orientation, exactly the reference's fill loop
    (:159-175). Single sequential binary stream → driver-side codec
    (fixture-tier, like the reference's fread loop); the edge table it
    yields is distributed."""
    import struct

    with open(path, "rb") as f:
        def ints(k):
            return struct.unpack(f">{k}i", f.read(4 * k))

        (magic,) = struct.unpack(">h", f.read(2))
        if magic != (ord("G") << 8 | ord("I")):
            raise ValueError("bad DibaP file: missing GI magic")
        (n_v,) = ints(1)
        (dvw,) = ints(1)
        if dvw > 0:
            ints(n_v * dvw)  # vertex weights — reference drops them (:161)
        of = ints(n_v + 1)
        num_e2 = of[n_v]
        to = ints(num_e2) if num_e2 else ()
        (dew,) = ints(1)
        ew = ints(num_e2 * dew) if dew > 0 else None
        # trailing coordinate block (dxy + floats) is ignored like vw
    rows = []
    for v in range(n_v):
        for e in range(of[v], of[v + 1]):
            if v <= to[e]:
                rows.append(
                    (v, to[e], float(ew[e]) if ew is not None else 1.0)
                )
    e_df = spark.createDataFrame(rows, "src long, dst long, weight double")
    v_df = spark.range(n_v).select(F.col("id").cast("long"))
    return GraphDF(v_df, e_df, directed=False, weighted=ew is not None)


def read_raster_points(
    spark: SparkSession,
    path: str,
    normalization_factor: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """RasterReader (io/RasterReader.cpp:19-101): ESRI ASCII grid raster →
    2D point cloud; cell (row, col) with value v spawns round(v·nf)
    points uniform in its unit square (x ∈ [col, col+1],
    y ∈ [1−(row+1), 1−row] — the reference's top-down y sweep).

    Spark-first split: the 6-line header parses on the driver, the CELL
    table distributes, and the POINT generation — the part that is huge
    when a population raster maps to 10^8 points — is a per-cell
    sequence explode with LCG coordinates (the reference draws
    Aux::Random reals, so coordinates are engine-random either way;
    ours are deterministic at any parallelism). Returns (x, y)."""
    from networkit_spark.functions.sampling import lcg_priority

    with open(path) as f:
        header = [f.readline() for _ in range(6)]
        ncols = int(float(header[0][14:].strip()))
        nrows = int(float(header[1][14:].strip()))
        cells = []
        for row in range(nrows):
            vals = f.readline().split()
            for col in range(ncols):
                npts = round(float(vals[col]) * normalization_factor)
                if npts > 0:
                    cells.append((row, col, int(npts)))
    if not cells:
        return spark.createDataFrame([], "x double, y double")
    cell_df = spark.createDataFrame(cells, "row long, col long, npts long")
    pts = cell_df.select(
        "row", "col", F.explode(F.sequence(F.lit(1), F.col("npts"))).alias("i")
    )
    key = (F.col("row") * 1000003 + F.col("col")) * 131071 + F.col("i")
    m = float(1 << 31)
    ux = lcg_priority(key, seed=seed) / F.lit(m)
    uy = lcg_priority(key * 31 + 7, seed=seed) / F.lit(m)
    return pts.select(
        (F.col("col") + ux).cast("double").alias("x"),
        (F.lit(1.0) - (F.col("row") + 1) + uy).cast("double").alias("y"),
    )
