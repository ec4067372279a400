"""DibapGraphReader + RasterReader (round-4 I/O completeness).

Reference: networkit/cpp/io/DibapGraphReader.cpp:34-180,
networkit/cpp/io/RasterReader.cpp:19-101.
"""

import struct

from networkit_spark.sources.readers import read_dibap, read_raster_points


def _write_dibap(path, offsets, targets, weights=None, dvw=0, n=None):
    """Build a DibaP 'GI' binary: big-endian magic, V, dvw(+vw), of, to,
    dew(+ew), dxy."""
    n = n if n is not None else len(offsets) - 1
    buf = struct.pack(">h", (ord("G") << 8) | ord("I"))
    buf += struct.pack(">i", n)
    buf += struct.pack(">i", dvw)
    if dvw:
        buf += struct.pack(f">{n * dvw}i", *([7] * (n * dvw)))
    buf += struct.pack(f">{len(offsets)}i", *offsets)
    buf += struct.pack(f">{len(targets)}i", *targets)
    if weights is None:
        buf += struct.pack(">i", 0)
    else:
        buf += struct.pack(">i", 1)
        buf += struct.pack(f">{len(weights)}i", *weights)
    buf += struct.pack(">i", 0)  # dxy
    path.write_bytes(buf)


def test_read_dibap_triangle_plus_pendant(spark, tmp_path):
    # adjacency: 0:[1,2] 1:[0,2] 2:[0,1,3] 3:[2]
    p = tmp_path / "g.dibap"
    _write_dibap(
        p,
        offsets=[0, 2, 4, 7, 8],
        targets=[1, 2, 0, 2, 0, 1, 3, 2],
    )
    g = read_dibap(spark, str(p))
    assert g.number_of_nodes() == 4
    edges = {(r["src"], r["dst"]) for r in g.E.collect()}
    assert edges == {(0, 1), (0, 2), (1, 2), (2, 3)}
    assert not g.weighted


def test_read_dibap_weighted_and_vertex_weights_skipped(spark, tmp_path):
    # single edge 0-1 with int weight 5; vertex-weight block present
    p = tmp_path / "gw.dibap"
    _write_dibap(
        p,
        offsets=[0, 1, 2],
        targets=[1, 0],
        weights=[5, 5],
        dvw=1,
    )
    g = read_dibap(spark, str(p))
    rows = g.E.collect()
    assert len(rows) == 1
    assert rows[0]["weight"] == 5.0
    assert g.weighted


def test_read_dibap_rejects_bad_magic(spark, tmp_path):
    p = tmp_path / "bad.dibap"
    p.write_bytes(struct.pack(">h", (ord("X") << 8) | ord("X")))
    try:
        read_dibap(spark, str(p))
        assert False, "expected ValueError"
    except ValueError:
        pass


def _write_raster(path, grid):
    nrows = len(grid)
    ncols = len(grid[0])
    lines = [
        f"ncols         {ncols}",
        f"nrows         {nrows}",
        "xllcorner     0.0",
        "yllcorner     0.0",
        "cellsize      1.0",
        "NODATA_value  -9999",
    ]
    for row in grid:
        lines.append(" ".join(str(v) for v in row))
    path.write_text("\n".join(lines) + "\n")


def test_raster_point_counts_and_bounds(spark, tmp_path):
    p = tmp_path / "pop.asc"
    _write_raster(p, [[2, 0], [1, 3]])
    pts = read_raster_points(spark, str(p)).collect()
    assert len(pts) == 6
    for r in pts:
        assert 0.0 <= r["x"] <= 2.0
        assert -1.0 <= r["y"] <= 1.0


def test_raster_normalization_and_determinism(spark, tmp_path):
    p = tmp_path / "pop.asc"
    _write_raster(p, [[10, 4]])
    a = sorted(
        (r["x"], r["y"])
        for r in read_raster_points(spark, str(p), 0.5).collect()
    )
    assert len(a) == 7  # round(10*0.5) + round(4*0.5)
    b = sorted(
        (r["x"], r["y"])
        for r in read_raster_points(spark, str(p), 0.5).collect()
    )
    assert a == b  # LCG coordinates: deterministic at any parallelism
    # cell (0,0) points sit in x∈[0,1], cell (0,1) in x∈[1,2]
    assert sum(1 for x, _ in a if x < 1.0) == 5
    assert sum(1 for x, _ in a if x >= 1.0) == 2
