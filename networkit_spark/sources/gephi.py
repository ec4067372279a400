"""Gephi export — graph-streaming-protocol client + CSV node values.

Reference analogs:
- networkit/gephi/pyclient.py:35-117 (JSON event protocol: an/cn/dn/
  ae/ce/de events, one JSON object per line, '\\r\\n' terminated,
  autoflush batching, POST to `?operation=updateGraph`),
- networkit/gephi/streaming.py:14-201 (GephiStreamingClient: exportGraph,
  exportNodeValues, exportCoordinates, exportEdgeValues, exportEventStream,
  clearGraph, deterministic grid placement, edge ids 'u->v' / 'min-max'),
- networkit/gephi/csv.py:6-17 (exportNodeValues CSV).

The transport is pluggable: the default posts to a running Gephi
Streaming master exactly like the reference; a callable transport (or
`GephiFileHandler`) captures the event stream for tests and offline
replay — no server required in this container.

Scale note: Gephi is a single-workstation canvas, so the export is
inherently driver-side (the reference iterates the whole graph too).
The client accepts either a GraphDF or plain edge/value DataFrames and
streams rows with `toLocalIterator()` so the driver never holds the full
edge table; anything bigger than a Gephi canvas should be sparsified
first (operators/sparsification.py) — same workflow as the reference.
"""

from __future__ import annotations

import json
import math
import time
from typing import Callable, Iterable

from pyspark.sql import DataFrame


class JSONClient:
    """gephi/pyclient.py:35-98 — event buffer with autoflush batching."""

    def __init__(
        self,
        transport: Callable[[str], None],
        autoflush: int = 0,
        enable_timestamps: bool = False,
    ):
        self._transport = transport
        self.data = ""
        self.autoflush = autoflush
        self.unflushed = 0
        self.enable_timestamps = enable_timestamps

    def _event(self, event: dict) -> str:
        if self.enable_timestamps:
            event["t"] = int(time.time())
        return json.dumps(event) + "\r\n"

    def flush(self) -> None:
        if self.data:
            self._transport(self.data)
            self.data = ""

    def _buffer(self, event: dict) -> None:
        self.data += self._event(event)
        self.unflushed += 1
        if self.unflushed > self.autoflush:
            self.flush()
            self.unflushed = 0

    def add_node(self, id: str, **attributes) -> None:
        self._buffer({"an": {id: attributes}})

    def change_node(self, id: str, **attributes) -> None:
        self._buffer({"cn": {id: attributes}})

    def delete_node(self, id: str) -> None:
        self._transport(self._event({"dn": {id: {}}}))

    def add_edge(self, id: str, source, target, directed=True, **attributes) -> None:
        attributes.update(source=source, target=target, directed=directed)
        self._buffer({"ae": {id: attributes}})

    def change_edge(self, id: str, source, target, directed=True, **attributes) -> None:
        attributes.update(source=source, target=target, directed=directed)
        self._buffer({"ce": {id: attributes}})

    def delete_edge(self, id: str) -> None:
        self._transport(self._event({"de": {id: {}}}))

    def clean(self) -> None:
        self._transport(self._event({"dn": {"filter": "ALL"}}))


def http_transport(url: str) -> Callable[[str], None]:
    """POST event batches to a Gephi Streaming master — pyclient.py:100-107."""
    import urllib.request

    def send(data: str) -> None:
        urllib.request.urlopen(url + "?operation=updateGraph", data.encode("utf-8"))

    return send


class GephiFileHandler(JSONClient):
    """pyclient.py:109-117 — write the event stream to a file object."""

    def __init__(self, out, **params):
        params.setdefault("autoflush", 0)
        super().__init__(out.write, **params)


class GephiStreamingClient:
    """gephi/streaming.py:14-201 over DataFrames.

    transport: None → HTTP POST to `url` (the reference default); any
    callable(str) → captured stream (tests, offline replay files).
    """

    def __init__(
        self,
        url: str = "http://localhost:8080/workspace0",
        transport: Callable[[str], None] | None = None,
    ):
        self._client = JSONClient(
            transport if transport is not None else http_transport(url),
            autoflush=10000,
        )
        self.graphExported = False
        self.directed = False

    def _edge_id(self, u, v) -> str:
        if self.directed:
            return f"{u}->{v}"
        return f"{min(u, v)}-{max(u, v)}"

    # ------------------------------------------------------------- export
    def exportGraph(self, graph) -> None:
        """streaming.py:39-58: clean, nodes on a deterministic grid
        (Gephi ≥0.9 forbids coincident coordinates), then edges."""
        self._client.clean()
        self.directed = bool(getattr(graph, "directed", False))
        n = graph.V.count()
        side = 0 if n == 0 else math.ceil(math.sqrt(n))
        step = 2000.0 / side if side else 0.0
        offset = 1000.0
        for i, row in enumerate(
            graph.V.select("id").orderBy("id").toLocalIterator()
        ):
            self._client.add_node(
                str(int(row["id"])),
                size=2.0, r=0.6, g=0.6, b=0.6,
                x=(i % side) * step - offset if side else 0.0,
                y=(i // side) * step - offset if side else 0.0,
            )
        for row in graph.E.select("src", "dst").toLocalIterator():
            u, v = int(row["src"]), int(row["dst"])
            self._client.add_edge(self._edge_id(u, v), u, v, self.directed)
        self._client.flush()
        self.graphExported = True

    def exportAdditionalEdge(self, u: int, v: int) -> None:
        self._require_exported()
        self._client.add_edge(self._edge_id(u, v), u, v, self.directed)
        self._client.flush()

    def removeExportedEdge(self, u: int, v: int) -> None:
        self._require_exported()
        self._client.delete_edge(self._edge_id(u, v))
        self._client.flush()

    def exportNodeValues(
        self, values: DataFrame, attribute_name: str, id_col: str = "id"
    ) -> None:
        """streaming.py:134-153 — one change_node per (id, value) row.
        `values` is any two-column frame (id, value)."""
        self._require_exported()
        value_col = [c for c in values.columns if c != id_col][0]
        for row in values.select(id_col, value_col).toLocalIterator():
            self._client.change_node(
                str(int(row[id_col])), **{attribute_name: row[value_col]}
            )
        self._client.flush()

    def exportCoordinates(self, coordinates: DataFrame, scale: float = 1) -> None:
        """streaming.py:158-166 over pivot_mds's (id, c0, c1) frame."""
        self._require_exported()
        for row in coordinates.select("id", "c0", "c1").toLocalIterator():
            self._client.change_node(
                str(int(row["id"])),
                x=scale * float(row["c0"]),
                y=scale * float(row["c1"]),
            )
        self._client.flush()

    def exportEdgeValues(
        self, edge_values: DataFrame, attribute_name: str
    ) -> None:
        """streaming.py:168-189 — (src, dst, value) rows → change_edge."""
        self._require_exported()
        edgetype = "Directed" if self.directed else "Undirected"
        value_col = [
            c for c in edge_values.columns if c not in ("src", "dst")
        ][0]
        for row in edge_values.select("src", "dst", value_col).toLocalIterator():
            u, v = int(row["src"]), int(row["dst"])
            self._client.change_edge(
                self._edge_id(u, v), u, v, self.directed,
                **{attribute_name: row[value_col], "Type": edgetype},
            )
        self._client.flush()

    def exportEventStream(self, stream: Iterable, time_step_delay: float = 0) -> None:
        """streaming.py:106-132 — replay a GraphEvent sequence (the
        streaming/events.py event model) into the Gephi canvas."""
        self._require_exported()
        for ev in stream:
            kind = getattr(ev, "type", None) or ev[0]
            u = getattr(ev, "u", None) if hasattr(ev, "u") else ev[1]
            v = getattr(ev, "v", None) if hasattr(ev, "v") else ev[2]
            if kind in ("an", "NODE_ADDITION"):
                self._client.add_node(str(u))
            elif kind in ("dn", "NODE_REMOVAL"):
                self._client.delete_node(str(u))
            elif kind in ("ae", "EDGE_ADDITION"):
                self._client.add_edge(self._edge_id(u, v), u, v, self.directed)
            elif kind in ("de", "EDGE_REMOVAL"):
                self._client.delete_edge(self._edge_id(u, v))
            elif kind in ("ts", "TIME_STEP"):
                self._client.flush()
                if time_step_delay > 0:
                    time.sleep(time_step_delay)
        self._client.flush()

    def clearGraph(self) -> None:
        self._client.clean()
        self._client.flush()
        self.graphExported = False

    def _require_exported(self) -> None:
        if not self.graphExported:
            raise RuntimeError("Export graph first (exportGraph)")


def export_node_values_csv(
    values: DataFrame, path: str, column_name: str, id_col: str = "id"
) -> None:
    """gephi/csv.py:6-17 — 'id,<name>' CSV for Gephi's importer.
    Driver-side writer (fixture tier), streamed row-at-a-time."""
    value_col = [c for c in values.columns if c != id_col][0]
    with open(path, "w") as f:
        f.write(f"id,{column_name}\n")
        for row in values.select(id_col, value_col).orderBy(id_col).toLocalIterator():
            f.write(f"{int(row[id_col])},{row[value_col]}\n")
