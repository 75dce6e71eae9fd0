"""FlatGeobuf IO tests (operators/flatgeobuf.py + geom/flatbuf.py).
Byte layouts verified against the reference's generated schema
(header_generated.h / feature_generated.h vtable ids) and
packedrtree.cpp's level math — the file is probed with raw struct
reads, not the writer's own code paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gdal_spark.operators.flatgeobuf import (
    MAGIC,
    NODE_BYTES,
    build_packed_rtree,
    decode_header,
    decode_properties,
    encode_properties,
    fgb_hilbert,
    level_bounds,
    read_fgb_meta,
    read_flatgeobuf,
    search_packed_rtree,
    write_flatgeobuf,
)

# ---------------------------------------------------------------------------
# packed R-tree unit pieces
# ---------------------------------------------------------------------------


def test_level_bounds_matches_reference_math():
    # generateLevelBounds(numItems=179, nodeSize=16):
    # levels bottom-up 179, 12, 1 -> total 192; offsets: root at 0,
    # mid at 1, leaves at 13
    assert level_bounds(179, 16) == [(13, 192), (1, 13), (0, 1)]
    assert level_bounds(1, 16) == [(0, 1)]
    assert level_bounds(16, 16) == [(1, 17), (0, 1)]
    assert level_bounds(17, 16) == [(3, 20), (1, 3), (0, 1)]


def test_hilbert_known_values():
    # the curve is a bijection on the 2^16 grid; pin a few anchors
    h = fgb_hilbert(np.array([0, 0xFFFF, 0]), np.array([0, 0xFFFF, 0xFFFF]))
    assert h[0] == 0
    # distinct corners map to distinct values
    assert len({int(v) for v in h}) == 3
    # locality: adjacent cells differ by 1 somewhere
    a = fgb_hilbert(np.array([100]), np.array([200]))[0]
    b = fgb_hilbert(np.array([101]), np.array([200]))[0]
    assert a != b


def test_rtree_build_and_search():
    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 1000, (200, 2))
    leaves = np.column_stack([pts[:, 0], pts[:, 1], pts[:, 0], pts[:, 1],
                              np.arange(200) * 100.0])
    tree = build_packed_rtree(leaves, 16)
    assert len(tree) == level_bounds(200, 16)[0][1] * NODE_BYTES
    box = (200.0, 200.0, 400.0, 400.0)
    hits = search_packed_rtree(tree, 200, 16, box)
    want = {
        i for i in range(200)
        if 200 <= pts[i, 0] <= 400 and 200 <= pts[i, 1] <= 400
    }
    assert {i for i, _ in hits} == want
    assert all(off == i * 100 for i, off in hits)


def test_properties_roundtrip():
    from gdal_spark.operators.flatgeobuf import COL_BOOL, COL_DOUBLE, COL_LONG, COL_STRING

    types = [COL_LONG, COL_DOUBLE, COL_STRING, COL_BOOL]
    vals = [123456789012, -2.5, "héllo, wörld", True]
    assert decode_properties(types, encode_properties(types, vals)) == vals
    # nulls are simply absent
    assert decode_properties(types, encode_properties(types, [None, 1.5, None, False])) == [
        None, 1.5, None, False,
    ]


# ---------------------------------------------------------------------------
# file round-trip
# ---------------------------------------------------------------------------

ROWS = [
    (0, "POINT (30 10)", "alpha", 7, 1.5),
    (1, "LINESTRING (0 0, 4 0, 4 3)", "beta", -2, -0.25),
    (2, "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))", "gamma", 12, 2.5),
    (3, "MULTIPOINT ((1 1), (2 2))", None, 0, 0.0),
    (4, "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))", "delta", 5, -9.75),
    (5, "MULTIPOLYGON (((20 20, 24 20, 24 24, 20 24, 20 20)), ((30 30, 31 30, 31 31, 30 31, 30 30)))", "eps", 6, 3.25),
]
SCHEMA = "fid long, wkt string, name string, n long, x double"


@pytest.fixture(scope="module")
def fgb_file(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fgb") / "t.fgb")
    df = spark.createDataFrame(ROWS, SCHEMA)
    info = write_flatgeobuf(df, path, name="feats", crs_code=4326)
    assert info["records"] == len(ROWS)
    assert info["extent"] == (0.0, 0.0, 31.0, 31.0)
    return path


def test_raw_layout(fgb_file):
    with open(fgb_file, "rb") as fh:
        buf = fh.read()
    assert buf[:8] == MAGIC
    (hlen,) = struct.unpack_from("<I", buf, 8)
    hdr = decode_header(buf[12 : 12 + hlen])
    assert hdr["name"] == "feats"
    assert hdr["features_count"] == 6
    assert hdr["geometry_type"] == 0  # mixed -> Unknown
    assert hdr["envelope"] == [0.0, 0.0, 31.0, 31.0]
    assert hdr["columns"] == [("fid", 7), ("name", 11), ("n", 7), ("x", 10)]
    assert hdr["index_node_size"] == 16
    assert hdr["crs_code"] == 4326
    # index section: 7 nodes (6 leaves + root) x 40 bytes
    n_nodes = level_bounds(6, 16)[0][1]
    assert n_nodes == 7
    root = struct.unpack_from("<4dQ", buf, 12 + hlen)
    assert root[:4] == (0.0, 0.0, 31.0, 31.0)  # root box == extent
    # features section: size-prefixed buffers that exactly tile the file
    pos = 12 + hlen + n_nodes * NODE_BYTES
    count = 0
    while pos < len(buf):
        (sz,) = struct.unpack_from("<I", buf, pos)
        pos += 4 + sz
        count += 1
    assert pos == len(buf) and count == 6


def test_roundtrip_values(spark, fgb_file):
    from gdal_spark.geom.wkt import parse_wkt, to_wkt

    got = {r["fid"]: (r["wkt"], r["name"], r["n"], r["x"])
           for r in read_flatgeobuf(spark, fgb_file).collect()}
    assert len(got) == len(ROWS)
    for fid, wkt, name, n, x in ROWS:
        canon = to_wkt(parse_wkt([wkt]))[0]
        assert got[fid][0] == canon, fid
        assert got[fid][1:] == (name, n, x), fid
    # fid here is the HILBERT-order position; the original fid rides
    # as a property and must be a permutation
    assert sorted(got) == list(range(6))


def test_bbox_pushdown(spark, fgb_file):
    out = read_flatgeobuf(spark, fgb_file, bbox=(0.0, 0.0, 5.0, 5.0))
    names = sorted(r["name"] for r in out.collect() if r["name"] is not None)
    # beta (line 0..4), gamma (polygon 0..8 overlaps), delta, multipoint(None)
    assert names == ["beta", "delta", "gamma"]
    # the driver planned FEWER bytes than a full scan: hits exclude the
    # far features (30 10) / (20..31)
    full = read_flatgeobuf(spark, fgb_file)
    assert out.count() == 4 and full.count() == 6


def test_splits_and_order(spark, tmp_path):
    # 500 points: multi-split read, hilbert order in file, index search
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 100, (500, 2)).round(3)
    rows = [(int(i), f"POINT ({pts[i,0]} {pts[i,1]})") for i in range(500)]
    df = spark.createDataFrame(rows, "orig long, wkt string").repartition(8)
    path = str(tmp_path / "pts.fgb")
    info = write_flatgeobuf(df, path, name="pts")
    assert info["records"] == 500
    meta = read_fgb_meta(path)
    assert meta["features_count"] == 500 and meta["geometry_type"] == 1
    out = read_flatgeobuf(spark, path, split_bytes=4096)
    assert out.rdd.getNumPartitions() > 1
    got = {r["orig"]: r["wkt"] for r in out.collect()}
    assert len(got) == 500
    assert got[17] == f"POINT ({pts[17,0]} {pts[17,1]})"
    # bbox read equals brute-force filter of the full read
    box = (25.0, 25.0, 75.0, 75.0)
    sub = {r["orig"] for r in read_flatgeobuf(spark, path, bbox=box).collect()}
    want = {
        int(i) for i in range(500)
        if 25 <= pts[i, 0] <= 75 and 25 <= pts[i, 1] <= 75
    }
    assert sub == want


def test_empty_layer(spark, tmp_path):
    path = str(tmp_path / "empty.fgb")
    df = spark.createDataFrame([], SCHEMA)
    info = write_flatgeobuf(df, path)
    assert info["records"] == 0
    assert read_flatgeobuf(spark, path).count() == 0


def test_null_geometry_rejected(spark, tmp_path):
    df = spark.createDataFrame([(1, None)], "fid long, wkt string")
    with pytest.raises(Exception, match="null/empty geometry"):
        write_flatgeobuf(df, str(tmp_path / "bad.fgb"))
