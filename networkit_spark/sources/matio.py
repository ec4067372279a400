"""MATLAB Level-5 .mat adjacency-matrix I/O (SURVEY §2.1).

Reference: networkit/graphio.pyx:839-886 — readMat loads a square
adjacency matrix from a .mat variable via scipy.io.loadmat and adds one
undirected edge per nonzero; writeMat saves the sparse adjacency matrix
back under a dictionary key. This container has no scipy, so the Level-5
container format is parsed/emitted directly from its public specification
(MathWorks "MAT-File Format": 128-byte header, 8-byte tagged data
elements, miMATRIX elements with arrayflags/dims/name subelements, sparse
ir/jc/pr CSC triplets, zlib-wrapped miCOMPRESSED elements) in pure
numpy + stdlib. Same tier as the reference: the .mat container is parsed
driver-side (fixture format), the edge table is distributed immediately.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF

# --- MAT5 data types
_MI_INT8, _MI_UINT8, _MI_INT16, _MI_UINT16 = 1, 2, 3, 4
_MI_INT32, _MI_UINT32, _MI_SINGLE, _MI_DOUBLE = 5, 6, 7, 9
_MI_INT64, _MI_UINT64, _MI_MATRIX, _MI_COMPRESSED = 12, 13, 14, 15
_MI_UTF8 = 16

_NUMERIC_NP = {
    _MI_INT8: np.int8, _MI_UINT8: np.uint8,
    _MI_INT16: np.int16, _MI_UINT16: np.uint16,
    _MI_INT32: np.int32, _MI_UINT32: np.uint32,
    _MI_SINGLE: np.float32, _MI_DOUBLE: np.float64,
    _MI_INT64: np.int64, _MI_UINT64: np.uint64,
    _MI_UTF8: np.uint8,
}

# --- MAT5 array classes
_MX_CHAR, _MX_SPARSE, _MX_DOUBLE = 4, 5, 6
_NUMERIC_CLASSES = set(range(6, 16))  # mxDOUBLE..mxUINT64


def _read_element(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    """One tagged data element at `pos` → (mi_type, payload, next_pos).
    Handles both the 8-byte tag and the packed small-element form
    (type in the low 16 bits, byte count in the high 16)."""
    (word,) = struct.unpack_from("<I", buf, pos)
    if word >> 16:  # small data element: ≤4 bytes inline
        mi, nbytes = word & 0xFFFF, word >> 16
        data = buf[pos + 4: pos + 4 + nbytes]
        return mi, data, pos + 8
    mi = word
    (nbytes,) = struct.unpack_from("<I", buf, pos + 4)
    data = buf[pos + 8: pos + 8 + nbytes]
    end = pos + 8 + nbytes
    if mi != _MI_COMPRESSED:  # spec: all elements pad to 8 EXCEPT compressed
        end += (-end) % 8
    return mi, data, end


def _parse_matrix(payload: bytes):
    """miMATRIX payload → (name, value); value is a dense ndarray or a
    ('sparse', data, ir, jc, shape) tuple. Unsupported classes → None."""
    pos = 0
    mi, flags_raw, pos = _read_element(payload, pos)
    flags = np.frombuffer(flags_raw[:8], dtype="<u4")
    mx_class = int(flags[0] & 0xFF)
    nzmax = int(flags[1])
    mi, dims_raw, pos = _read_element(payload, pos)
    dims = tuple(int(d) for d in np.frombuffer(dims_raw, dtype="<i4"))
    mi, name_raw, pos = _read_element(payload, pos)
    name = name_raw.tobytes().decode() if isinstance(name_raw, np.ndarray) \
        else name_raw.decode("latin-1")
    if mx_class == _MX_SPARSE:
        mi, ir_raw, pos = _read_element(payload, pos)
        ir = np.frombuffer(ir_raw, dtype="<i4")
        mi, jc_raw, pos = _read_element(payload, pos)
        jc = np.frombuffer(jc_raw, dtype="<i4")
        mi, pr_raw, pos = _read_element(payload, pos)
        pr = np.frombuffer(pr_raw, dtype=np.dtype(_NUMERIC_NP[mi]).newbyteorder("<"))
        nnz = int(jc[-1]) if len(jc) else 0
        # ir/pr may be allocated at nzmax > nnz; trim to the live prefix
        return name, ("sparse", pr[:nnz].astype(np.float64),
                      ir[:nnz].astype(np.int64), jc.astype(np.int64), dims)
    if mx_class in _NUMERIC_CLASSES:
        mi, pr_raw, pos = _read_element(payload, pos)
        pr = np.frombuffer(pr_raw, dtype=np.dtype(_NUMERIC_NP[mi]).newbyteorder("<"))
        return name, pr.astype(np.float64).reshape(dims, order="F")
    return name, None  # char/cell/struct: not adjacency material


def loadmat(path: str) -> dict:
    """Minimal scipy.io.loadmat analog: {variable name: ndarray | sparse
    tuple} for the numeric/sparse variables of a Level-5 file (little-
    endian, miCOMPRESSED supported)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if len(buf) < 128:
        raise ValueError(f"{path}: not a MAT5 file (short header)")
    version, endian = struct.unpack_from("<HH", buf, 124)
    if endian != 0x4D49:  # 'IM' little-endian; 'MI' would be big-endian
        raise ValueError(
            f"{path}: unsupported MAT5 endianness/indicator 0x{endian:04x}"
        )
    out = {}
    pos = 128
    while pos + 8 <= len(buf):
        mi, payload, pos = _read_element(buf, pos)
        if mi == _MI_COMPRESSED:
            inner = zlib.decompress(payload)
            mi2, payload2, _ = _read_element(inner, 0)
            if mi2 != _MI_MATRIX:
                continue
            payload = payload2
        elif mi != _MI_MATRIX:
            continue
        name, value = _parse_matrix(payload)
        if value is not None:
            out[name] = value
    return out


def read_mat(
    spark: SparkSession, path: str, key: str = "G", weighted: bool = False
) -> GraphDF:
    """MatReader (graphio.pyx:840-866): load the square adjacency matrix
    stored under `key` and add ONE undirected edge per nonzero (u, v) —
    the reference's hasEdge guard collapses the two symmetric orientations,
    which here is a canonical (least, greatest) distinct over the nonzero
    coordinates. Node count = matrix dimension (isolated rows kept)."""
    variables = loadmat(path)
    if key not in variables:
        raise KeyError(f"Key {key} not found in the matlab object file")
    a = variables[key]
    if isinstance(a, tuple) and a[0] == "sparse":
        _, pr, ir, jc, dims = a
        n, n2 = dims
        cols = np.repeat(np.arange(len(jc) - 1), np.diff(jc))
        rows = ir
        vals = pr
    else:
        n, n2 = a.shape
        rows, cols = np.nonzero(a)
        vals = a[rows, cols]
    if n != n2:
        raise ValueError(f"this ({n}x{n2}) matrix is not square")
    e = spark.createDataFrame(
        list(zip(rows.tolist(), cols.tolist(), [float(v) for v in vals])),
        "r long, c long, weight double",
    ) if len(rows) else spark.createDataFrame([], "r long, c long, weight double")
    edges = (
        e.select(
            F.least("r", "c").alias("src"),
            F.greatest("r", "c").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
    )
    if not weighted:
        edges = edges.select("src", "dst", F.lit(1.0).alias("weight"))
    v = spark.range(int(n)).select(F.col("id").cast("long"))
    return GraphDF(v, edges, directed=False, weighted=weighted)


def _element(mi: int, data: bytes) -> bytes:
    pad = (-len(data)) % 8
    return struct.pack("<II", mi, len(data)) + data + b"\x00" * pad


def write_mat(graph: GraphDF, path: str, key: str = "G") -> None:
    """MatWriter (graphio.pyx:868-886): save the symmetric sparse adjacency
    matrix (CSC ir/jc/pr, both orientations of every undirected edge, the
    adjacencyMatrix(G, 'sparse') layout) as an uncompressed Level-5
    miMATRIX under `key`. Fixture-format writer tier: edges collect to the
    driver like the reference's scipy path."""
    n = graph.upper_node_id_bound()
    rows = graph.E.select("src", "dst", "weight").collect()
    coo = {}
    for r in rows:
        u, v, w = int(r["src"]), int(r["dst"]), float(r["weight"])
        coo[(u, v)] = w
        if not graph.directed:
            coo[(v, u)] = w
    # CSC order: by column, then row
    entries = sorted(coo.items(), key=lambda kv: (kv[0][1], kv[0][0]))
    ir = np.array([u for (u, _c), _w in entries], dtype="<i4")
    pr = np.array([w for _k, w in entries], dtype="<f8")
    jc = np.zeros(n + 1, dtype="<i4")
    for (_u, c), _w in entries:
        jc[c + 1] += 1
    jc = np.cumsum(jc).astype("<i4")
    nnz = max(len(entries), 1)

    flags = struct.pack("<II", _MX_SPARSE, nnz)
    dims = np.array([n, n], dtype="<i4").tobytes()
    body = (
        _element(_MI_UINT32, flags)
        + _element(_MI_INT32, dims)
        + _element(_MI_INT8, key.encode())
        + _element(_MI_INT32, ir.tobytes())
        + _element(_MI_INT32, jc.tobytes())
        + _element(_MI_DOUBLE, pr.tobytes())
    )
    header = b"MATLAB 5.0 MAT-file, networkit_spark write_mat".ljust(116)
    header += b"\x00" * 8 + struct.pack("<HH", 0x0100, 0x4D49)
    with open(path, "wb") as fh:
        fh.write(header + _element(_MI_MATRIX, body))
