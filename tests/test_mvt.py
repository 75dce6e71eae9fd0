"""MVT encoder tests: an independent minimal protobuf decoder verifies
the hand-rolled encoding round-trips (spec 2.1 layout)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import Row

from gdal_spark.operators.mvt import (
    GEOM_LINESTRING,
    GEOM_POINT,
    GEOM_POLYGON,
    encode_geometry,
    encode_layer,
    encode_tile,
    mvt_tiles,
)


# --- minimal protobuf reader (test-side, independent of the encoder) --------


def _rv(b, i):
    v = s = 0
    while True:
        x = b[i]
        i += 1
        v |= (x & 0x7F) << s
        if not x & 0x80:
            return v, i
        s += 7


def _unzig(v):
    return (v >> 1) ^ -(v & 1)


def _fields(b):
    i = 0
    while i < len(b):
        key, i = _rv(b, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _rv(b, i)
        elif wire == 2:
            ln, i = _rv(b, i)
            v = b[i : i + ln]
            i += ln
        elif wire == 1:
            v = b[i : i + 8]
            i += 8
        else:
            raise ValueError(wire)
        yield field, wire, v


def decode_tile(b):
    layers = []
    for field, _, v in _fields(b):
        if field == 3:
            layers.append(decode_layer(v))
    return layers


def decode_layer(b):
    out = {"features": [], "keys": [], "values": []}
    for field, _, v in _fields(b):
        if field == 15:
            out["version"] = v
        elif field == 1:
            out["name"] = v.decode()
        elif field == 2:
            out["features"].append(decode_feature(v))
        elif field == 3:
            out["keys"].append(v.decode())
        elif field == 4:
            out["values"].append(decode_value(v))
        elif field == 5:
            out["extent"] = v
    return out


def decode_value(b):
    for field, _, v in _fields(b):
        if field == 1:
            return v.decode()
        if field == 3:
            return struct.unpack("<d", v)[0]
        if field == 6:
            return _unzig(v)
        if field == 7:
            return bool(v)
    return None


def decode_feature(b):
    f = {"tags": [], "geometry": []}
    for field, wire, v in _fields(b):
        if field == 1:
            f["id"] = v
        elif field == 2:
            i = 0
            while i < len(v):
                t, i = _rv(v, i)
                f["tags"].append(t)
        elif field == 3:
            f["type"] = v
        elif field == 4:
            i = 0
            while i < len(v):
                t, i = _rv(v, i)
                f["geometry"].append(t)
    return f


def decode_geometry(cmds, gtype):
    """Command stream -> list of coordinate sequences."""
    seqs = []
    cur = []
    x = y = 0
    i = 0
    while i < len(cmds):
        c = cmds[i]
        i += 1
        cmd_id, count = c & 7, c >> 3
        if cmd_id == 1:  # MoveTo
            if cur:
                seqs.append(cur)
                cur = []
            for _ in range(count):
                x += _unzig(cmds[i]); y += _unzig(cmds[i + 1]); i += 2
                if gtype == GEOM_POINT:
                    seqs.append([(x, y)])
                else:
                    cur.append((x, y))
        elif cmd_id == 2:  # LineTo
            for _ in range(count):
                x += _unzig(cmds[i]); y += _unzig(cmds[i + 1]); i += 2
                cur.append((x, y))
        else:  # ClosePath
            cur.append(cur[0])
    if cur:
        seqs.append(cur)
    return seqs


class TestEncoder:
    def test_polygon_roundtrip(self):
        ring = np.array([[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]])
        layer = encode_layer(
            "roads", [{"id": 7, "type": GEOM_POLYGON, "parts": [ring], "attrs": {"kind": "x", "n": 3}}]
        )
        tile = encode_tile([layer])
        layers = decode_tile(tile)
        assert len(layers) == 1
        L = layers[0]
        assert L["name"] == "roads" and L["version"] == 2 and L["extent"] == 4096
        f = L["features"][0]
        assert f["id"] == 7 and f["type"] == GEOM_POLYGON
        seqs = decode_geometry(f["geometry"], GEOM_POLYGON)
        assert seqs == [[(0, 0), (100, 0), (100, 100), (0, 100), (0, 0)]]
        attrs = {L["keys"][f["tags"][i]]: L["values"][f["tags"][i + 1]] for i in range(0, len(f["tags"]), 2)}
        assert attrs == {"kind": "x", "n": 3}

    def test_point_and_line(self):
        pts = np.array([[5, 5], [9, 2]])
        line = np.array([[0, 0], [10, 0], [10, 10]])
        layer = encode_layer(
            "mix",
            [
                {"id": 1, "type": GEOM_POINT, "parts": [pts], "attrs": {}},
                {"id": 2, "type": GEOM_LINESTRING, "parts": [line], "attrs": {}},
            ],
        )
        L = decode_tile(encode_tile([layer]))[0]
        f0, f1 = L["features"]
        assert decode_geometry(f0["geometry"], GEOM_POINT) == [[(5, 5)], [(9, 2)]]
        assert decode_geometry(f1["geometry"], GEOM_LINESTRING) == [[(0, 0), (10, 0), (10, 10)]]

    def test_negative_deltas_zigzag(self):
        line = np.array([[100, 100], [50, 80]])
        cmds = encode_geometry(GEOM_LINESTRING, [line])
        assert decode_geometry(cmds, GEOM_LINESTRING) == [[(100, 100), (50, 80)]]

    def test_negative_id_skipped_not_hang(self):
        """ADVICE r2: a negative feature id used to make _varint spin
        forever in the executor. Spec ids are uint64 — negatives are
        dropped, the feature still encodes."""
        from gdal_spark.operators.mvt import _varint

        with pytest.raises(ValueError):
            _varint(-1)
        pts = np.array([[5, 5]])
        layer = encode_layer("p", [{"id": -3, "type": GEOM_POINT, "parts": [pts], "attrs": {}}])
        L = decode_tile(encode_tile([layer]))[0]
        f = L["features"][0]
        assert f.get("id") is None
        assert decode_geometry(f["geometry"], GEOM_POINT) == [[(5, 5)]]


class TestSparkSink:
    def test_tiles_encode_and_decode(self, spark):
        from gdal_spark.operators.tiles import WebMercatorQuad

        tms = WebMercatorQuad()
        # a polygon around the origin in web-mercator coords, z=2
        df = spark.createDataFrame(
            [
                Row(_id=1, kind="a", wkt="POLYGON ((0 0,2000000 0,2000000 2000000,0 2000000,0 0))"),
                Row(_id=2, kind="b", wkt="POINT (1000000 1000000)"),
            ]
        )
        out = mvt_tiles(df, tms, z=2, layer_name="test", attr_cols=["kind"]).collect()
        assert len(out) >= 1
        total_feats = 0
        for r in out:
            assert (r.z, r.tx >= 0, r.ty >= 0) == (2, True, True)
            layers = decode_tile(bytes(r.payload))
            assert layers and layers[0]["name"] == "test"
            for f in layers[0]["features"]:
                total_feats += 1
                seqs = decode_geometry(f["geometry"], f["type"])
                for seq in seqs:
                    for x, y in seq:
                        assert -300 <= x <= 4396 and -300 <= y <= 4396
        assert total_feats >= 2


class TestWinding:
    def test_exterior_positive_interior_negative(self, spark):
        """MVT 2.1 spec 4.3.3.3: exterior rings positive surveyor's
        area in TILE coords (y down), holes negative."""
        from gdal_spark.operators.tiles import WebMercatorQuad

        tms = WebMercatorQuad()
        donut = ("POLYGON ((0 0,4000000 0,4000000 4000000,0 4000000,0 0),"
                 "(1000000 1000000,3000000 1000000,3000000 3000000,1000000 3000000,1000000 1000000))")
        df = spark.createDataFrame([Row(_id=1, wkt=donut)])
        out = mvt_tiles(df, tms, z=3, layer_name="w").collect()
        assert out
        found_shell = found_hole = False
        for r in out:
            for L in decode_tile(bytes(r.payload)):
                for f in L["features"]:
                    for seq in decode_geometry(f["geometry"], GEOM_POLYGON):
                        x = np.array([p[0] for p in seq], float)
                        y = np.array([p[1] for p in seq], float)
                        a2 = np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])
                        if abs(a2) < 1:
                            continue
                        if a2 > 0:
                            found_shell = True
                        else:
                            found_hole = True
        assert found_shell  # every tile has a correctly-wound shell
        assert found_hole  # the donut hole survives with negative area
