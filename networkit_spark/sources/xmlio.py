"""GraphML + GEXF I/O (reference: networkit/GraphMLIO.py, GEXFIO.py —
the reference's own implementations are driver-side Python XML parsers
(xml.sax / minidom), so a driver-side parse is the equivalent tier here;
the parsed node/edge/event tables are distributed DataFrames.

GEXF dynamics follow GEXFIO.GEXFReader.parseDynamics exactly: spells or
inline start/end become NODE/EDGE ADDITION/REMOVAL/RESTORATION events,
dynamic edge weights become EDGE_WEIGHT_UPDATE, TIME_STEP rows delimit
distinct timestamps, and dynamically added nodes are renumbered by
addition order after the initial nodes (GEXFIO.py:220-249). The event
schema matches streaming/events.py, so fold_events() replays a GEXF
stream directly.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.dom import minidom

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


# ------------------------------------------------------------------ GraphML


def read_graphml(spark: SparkSession, path: str) -> GraphDF:
    """GraphMLReader (GraphMLIO.py:6-95): `edgedefault` sets direction, a
    `<key for="edge" attr.name="weight" attr.type="double">` declares the
    weighted dialect, node string ids map to insertion order, edge weight
    comes from the matching `<data key=...>` child."""
    doc = minidom.parse(path)
    graphs = doc.getElementsByTagName("graph")
    if not graphs:
        raise ValueError("no <graph> element")
    gel = graphs[0]
    directed = gel.getAttribute("edgedefault") == "directed"
    weight_key = ""
    for k in doc.getElementsByTagName("key"):
        if (
            k.getAttribute("for") == "edge"
            and k.getAttribute("attr.name") == "weight"
            and k.getAttribute("attr.type") == "double"
        ):
            weight_key = k.getAttribute("id")
    mapping: dict[str, int] = {}
    for n in doc.getElementsByTagName("node"):
        mapping[n.getAttribute("id")] = len(mapping)
    edges = []
    for e in doc.getElementsByTagName("edge"):
        u = mapping[e.getAttribute("source")]
        v = mapping[e.getAttribute("target")]
        w = 1.0
        if weight_key:
            for d in e.getElementsByTagName("data"):
                if d.getAttribute("key") == weight_key and d.firstChild is not None:
                    w = float(d.firstChild.data.strip())
        edges.append((u, v, w))
    e_df = spark.createDataFrame(edges or [], "src long, dst long, weight double")
    v_df = spark.range(len(mapping)).select(F.col("id").cast("long"))
    return GraphDF.from_edges(
        e_df, directed=directed, weighted=bool(weight_key), vertices=v_df
    )


def write_graphml(graph: GraphDF, path: str) -> None:
    """GraphMLWriter (GraphMLIO.py:98-200): graphml root, a d1 weight key
    for weighted graphs, `<graph edgedefault=...>`, node/edge elements with
    `<data key="d1">` weights. Canonical edge order for stable goldens."""
    root = ET.Element("graphml")
    root.set("xmlns", "http://graphml.graphdrawing.org/xmlns")
    if graph.weighted:
        key = ET.SubElement(root, "key")
        key.set("for", "edge")
        key.set("id", "d1")
        key.set("attr.name", "weight")
        key.set("attr.type", "double")
    gel = ET.SubElement(root, "graph")
    gel.set("id", "G")
    gel.set("edgedefault", "directed" if graph.directed else "undirected")
    for r in graph.V.orderBy("id").collect():
        ne = ET.SubElement(gel, "node")
        ne.set("id", f"n{r['id']}")
    for i, r in enumerate(graph.E.orderBy("src", "dst").collect()):
        ee = ET.SubElement(gel, "edge")
        ee.set("id", f"e{i}")
        ee.set("source", f"n{r['src']}")
        ee.set("target", f"n{r['dst']}")
        if graph.weighted:
            d = ET.SubElement(ee, "data")
            d.set("key", "d1")
            d.text = str(float(r["weight"]))
    ET.ElementTree(root).write(path, xml_declaration=True, encoding="unicode")


# --------------------------------------------------------------------- GEXF


def _gexf_time(val: str, time_format: str):
    if val == "":
        return ""
    if time_format != "date":
        try:
            return float(val)
        except ValueError:
            return val
    return val


def read_gexf(spark: SparkSession, path: str) -> tuple[GraphDF, DataFrame]:
    """GEXFReader (GEXFIO.py:7-115 + parseDynamics:117-198 +
    mapDynamicNodes:220-249): returns (initial graph, event stream).
    Static files yield an empty stream. See module docstring for the
    event semantics mirrored here."""
    doc = minidom.parse(path)
    gel = doc.getElementsByTagName("graph")[0]
    directed = gel.getAttribute("defaultedgetype") == "directed"
    dynamic = gel.getAttribute("mode") == "dynamic"
    time_format = gel.getAttribute("timeformat") if dynamic else ""
    has_dynamic_weights = any(
        a.getAttribute("id") == "weight"
        for a in gel.getElementsByTagName("attribute")
    )
    weighted = has_dynamic_weights

    mapping: dict = {}
    n_initial = 0
    raw_events: list[tuple[str, object, object, float, float]] = []
    # (etype_code, u_key, v_key, w, time) — node events carry the GEXF int
    # id and are renumbered after the node pass like the reference

    def create_event(t, code, u, v, w):
        vv = mapping[v] if code[1] == "e" else 0
        raw_events.append((code, mapping[u], vv, float(w), t))

    def parse_dynamics(element, etype, control, u, v="0", w="1.0"):
        nonlocal n_initial, weighted
        start = element.getAttribute("start") or element.getAttribute("startopen")
        end = element.getAttribute("end") or element.getAttribute("endopen")
        start = _gexf_time(start, time_format)
        end = _gexf_time(end, time_format)

        if start != "" and end != "":
            if start < end and not control["deleted"]:
                create_event(start, "a" + etype, u, v, w)
                control["added"] = True
            else:
                create_event(start, "r" + etype, u, v, w)
            create_event(end, "d" + etype, u, v, w)
            control["deleted"] = True
        if start != "" and end == "":
            if control["deleted"]:
                create_event(start, "r" + etype, u, v, w)
            else:
                create_event(start, "a" + etype, u, v, w)
                control["added"] = True
        if etype == "e" and has_dynamic_weights:
            attvalues = element.getElementsByTagName("attvalue")
            if len(attvalues) == 0 and element.parentNode.parentNode is not None:
                attvalues = element.parentNode.parentNode.getElementsByTagName(
                    "attvalue"
                )
            for att in attvalues:
                if att.getAttribute("for") == "weight":
                    wv = att.getAttribute("value")
                    st = att.getAttribute("start") or att.getAttribute("startopen")
                    st = _gexf_time(st, time_format)
                    if not control["added"]:
                        create_event(st, "a" + etype, u, v, wv)
                        control["added"] = True
                    else:
                        create_event(st, "c" + etype, u, v, wv)
        if start == "":
            if not control["added"]:
                if etype == "n":
                    mapping[u] = n_initial
                    n_initial += 1
                else:
                    static_edges.append((mapping[u], mapping[v], float(w)))
                control["added"] = True
            if end != "":
                create_event(end, "d" + etype, u, v, w)
                control["deleted"] = True

    static_edges: list[tuple[int, int, float]] = []

    # ---- node pass
    for n in doc.getElementsByTagName("node"):
        u = n.getAttribute("id")
        if dynamic:
            try:
                _id = int(u)
            except ValueError:
                _id = int(u[1:])
            mapping[u] = _id
            mapping[_id] = u
            control = {"added": False, "deleted": False}
            spells = n.getElementsByTagName("spell")
            if spells:
                for s in spells:
                    parse_dynamics(s, "n", control, u)
            else:
                parse_dynamics(n, "n", control, u)
        else:
            mapping[u] = n_initial
            n_initial += 1

    # ---- renumber dynamically added nodes by addition order
    # (mapDynamicNodes, GEXFIO.py:220-249)
    if dynamic:
        raw_events.sort(key=lambda x: x[4])
        n_nodes = n_initial
        is_mapped = [False] * len(raw_events)
        for i, ev in enumerate(raw_events):
            if not is_mapped[i] and ev[0] == "an":
                u = ev[1]
                mapping[mapping[u]] = n_nodes
                for j in range(i, len(raw_events)):
                    ej = raw_events[j]
                    if not is_mapped[j] and ej[1] == u:
                        raw_events[j] = (ej[0], n_nodes, 0, ej[3], ej[4])
                        is_mapped[j] = True
                n_nodes += 1
                is_mapped[i] = True

    # ---- edge pass (after node renumbering, like the reference)
    for e in doc.getElementsByTagName("edge"):
        u = e.getAttribute("source")
        v = e.getAttribute("target")
        w = "1.0"
        if e.hasAttribute("weight"):
            weighted = True
            w = e.getAttribute("weight")
        if dynamic:
            control = {"added": False, "deleted": False}
            spells = e.getElementsByTagName("spell")
            if spells:
                for s in spells:
                    parse_dynamics(s, "e", control, u, v, w)
            else:
                parse_dynamics(e, "e", control, u, v, w)
        else:
            static_edges.append((mapping[u], mapping[v], float(w)))

    # ---- TIME_STEP delimiters between distinct timestamps
    raw_events.sort(key=lambda x: x[4])
    steps = []
    for i in range(1, len(raw_events)):
        if raw_events[i][4] != raw_events[i - 1][4]:
            steps.append(("ts", 0, 0, 0.0, raw_events[i - 1][4]))
    raw_events.extend(steps)
    raw_events.sort(key=lambda x: x[4])

    code_map = {
        "an": "NODE_ADDITION",
        "dn": "NODE_REMOVAL",
        "rn": "NODE_RESTORATION",
        "ae": "EDGE_ADDITION",
        "re": "EDGE_ADDITION",  # GEXFIO maps restore-edge to addition
        "de": "EDGE_REMOVAL",
        "ce": "EDGE_WEIGHT_UPDATE",
        "ts": "TIME_STEP",
    }
    def _t_num(t):
        # timeformat="date" carries ISO dates; the reference sorts the raw
        # strings (ISO order ≡ chronological) — numeric column = epoch secs
        if isinstance(t, str):
            from datetime import datetime, timezone

            return datetime.fromisoformat(t).replace(tzinfo=timezone.utc).timestamp()
        return float(t)

    rows = [
        (i, code_map[c], int(u), int(v), float(w), _t_num(t))
        for i, (c, u, v, w, t) in enumerate(raw_events)
    ]
    events = spark.createDataFrame(
        rows or [], "seq long, type string, u long, v long, w double, t double"
    )
    e_df = spark.createDataFrame(
        static_edges or [], "src long, dst long, weight double"
    )
    v_df = spark.range(n_initial).select(F.col("id").cast("long"))
    g = GraphDF.from_edges(e_df, directed=directed, weighted=weighted, vertices=v_df)
    return g, events


def write_gexf(graph: GraphDF, path: str, events: DataFrame | None = None) -> None:
    """GEXFWriter (GEXFIO.py:260-380): gexf 1.2draft root; dynamic mode
    with double timeformat when an event stream is given (elements carry
    start/end from their ADDITION/REMOVAL events), static node/edge lists
    otherwise."""
    root = ET.Element("gexf")
    root.set("xmlns", "http://www.gexf.net/1.2draft")
    root.set("version", "1.2")
    gel = ET.SubElement(root, "graph")
    gel.set("defaultedgetype", "directed" if graph.directed else "undirected")

    ev_rows = events.orderBy("seq").collect() if events is not None else []
    if ev_rows:
        gel.set("mode", "dynamic")
        gel.set("timeformat", "double")
    node_start: dict[int, float] = {}
    node_end: dict[int, float] = {}
    edge_start: dict[tuple[int, int], float] = {}
    edge_end: dict[tuple[int, int], float] = {}
    for r in ev_rows:
        if r["type"] == "NODE_ADDITION":
            node_start.setdefault(r["u"], r["t"])
        elif r["type"] == "NODE_REMOVAL":
            node_end[r["u"]] = r["t"]
        elif r["type"] == "EDGE_ADDITION":
            edge_start.setdefault((r["u"], r["v"]), r["t"])
        elif r["type"] == "EDGE_REMOVAL":
            edge_end[(r["u"], r["v"])] = r["t"]

    nodes_el = ET.SubElement(gel, "nodes")
    all_nodes = sorted(
        {r["id"] for r in graph.V.collect()} | set(node_start) | set(node_end)
    )
    for u in all_nodes:
        ne = ET.SubElement(nodes_el, "node")
        ne.set("id", str(u))
        if u in node_start:
            ne.set("start", str(node_start[u]))
        if u in node_end:
            ne.set("end", str(node_end[u]))
    edges_el = ET.SubElement(gel, "edges")
    static = [(r["src"], r["dst"], r["weight"]) for r in graph.E.orderBy("src", "dst").collect()]
    dynamic_pairs = set(edge_start) | set(edge_end)
    for i, (u, v, w) in enumerate(
        static + [(u, v, 1.0) for (u, v) in sorted(dynamic_pairs)]
    ):
        ee = ET.SubElement(edges_el, "edge")
        ee.set("id", str(i))
        ee.set("source", str(u))
        ee.set("target", str(v))
        if graph.weighted:
            ee.set("weight", str(float(w)))
        if (u, v) in edge_start:
            ee.set("start", str(edge_start[(u, v)]))
        if (u, v) in edge_end:
            ee.set("end", str(edge_end[(u, v)]))
    ET.ElementTree(root).write(path, xml_declaration=True, encoding="unicode")
