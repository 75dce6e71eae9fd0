"""Shapefile IO: codec round-trips, ring organization, dBASE, the
.shx-planned distributed scan, and the streaming sink.

Reference shapes: /root/reference/ogr/ogrsf_frmts/shape/shape2ogr.cpp
(ring organization), shapelib/shpopen.c (framing),
autotest/ogr/ogr_shape.py (round-trip style).
"""

import os
import struct

import numpy as np
import pytest

from gdal_spark.geom.batch import GeomBatchBuilder, GeomType
from gdal_spark.geom.wkt import parse_wkt, to_wkt
from gdal_spark.operators.shapefile import (
    DbfField,
    SHPT_ARC,
    SHPT_MULTIPOINT,
    SHPT_NULL,
    SHPT_POINT,
    SHPT_POLYGON,
    decode_dbf_header,
    decode_dbf_values,
    decode_shp_geometry,
    encode_dbf_header,
    encode_dbf_record,
    encode_shp_geometry,
    infer_dbf_fields,
    organize_rings,
    read_shapefile,
    read_shx,
    write_shapefile,
)

WKTS = [
    "POINT (3 4)",
    "LINESTRING (0 0, 1 1, 2 0)",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), "
    "((20 20, 30 20, 30 30, 20 30, 20 20), (22 22, 24 22, 24 24, 22 24, 22 22)))",
    "MULTILINESTRING ((0 0, 1 1), (5 5, 6 6, 7 5))",
    "MULTIPOINT ((1 2), (3 4), (5 6))",
]

GT_OF_CODE = {
    SHPT_POINT: lambda p: GeomType.POINT,
    SHPT_MULTIPOINT: lambda p: GeomType.MULTIPOINT,
    SHPT_ARC: lambda p: GeomType.LINESTRING if len(p) == 1 else GeomType.MULTILINESTRING,
    SHPT_POLYGON: lambda p: GeomType.POLYGON if len(p) == 1 else GeomType.MULTIPOLYGON,
}


def roundtrip_wkt(wkt: str) -> str:
    b = parse_wkt([wkt])
    gt, parts = b.geometry(0)
    code, parts2, z, m = decode_shp_geometry(encode_shp_geometry(gt, parts))
    builder = GeomBatchBuilder()
    builder.add(GT_OF_CODE[code](parts2), parts2)
    return to_wkt(builder.finish())[0]


def geom_signature(wkt: str):
    """Orientation-insensitive: (type, envelope, |area|, n coords)."""
    b = parse_wkt([wkt])
    env = b.envelopes()[0]
    return (
        int(b.types[0]),
        tuple(np.round(env, 9)),
        round(float(abs(b.areas()[0])), 9),
        len(b.coords),
    )


class TestGeometryCodec:
    @pytest.mark.parametrize("wkt", WKTS)
    def test_roundtrip_signature(self, wkt):
        # ring orientation is normalized by the format (shells CW) so
        # compare the orientation-insensitive signature
        assert geom_signature(roundtrip_wkt(wkt)) == geom_signature(
            to_wkt(parse_wkt([wkt]))[0]
        )

    def test_point_record_is_20_bytes(self):
        b = parse_wkt(["POINT (1 2)"])
        payload = encode_shp_geometry(*b.geometry(0))
        assert len(payload) == 20
        assert struct.unpack_from("<i", payload)[0] == SHPT_POINT

    def test_square_polygon_record_is_128_bytes(self):
        b = parse_wkt(["POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"])
        payload = encode_shp_geometry(*b.geometry(0))
        # 4 type + 32 bbox + 8 counts + 4 part start + 5*16 coords
        assert len(payload) == 128

    def test_null_and_empty(self):
        assert encode_shp_geometry(GeomType.POLYGON, []) == struct.pack("<i", SHPT_NULL)
        code, parts, z, m = decode_shp_geometry(struct.pack("<i", SHPT_NULL))
        assert code == SHPT_NULL and parts == []

    def test_written_shells_are_clockwise(self):
        b = parse_wkt(["POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"])
        payload = encode_shp_geometry(*b.geometry(0))
        code, parts, _, _ = decode_shp_geometry(payload)
        shell, hole = parts[0][0], parts[0][1]

        def area2(r):
            return float(np.dot(r[:, 0], np.roll(r[:, 1], -1)) - np.dot(np.roll(r[:, 0], -1), r[:, 1]))

        assert area2(shell) < 0  # CW
        assert area2(hole) > 0  # CCW


class TestRingOrganization:
    def cw(self, ring):
        return np.asarray(ring, dtype=float)[::-1]

    def test_hole_assigned_by_containment(self):
        shell_a = self.cw([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
        shell_b = self.cw([[20, 0], [30, 0], [30, 10], [20, 10], [20, 0]])
        hole_b = np.array([[22.0, 2], [24, 2], [24, 4], [22, 4], [22, 2]])
        polys = organize_rings([shell_a, shell_b, hole_b])
        assert len(polys) == 2
        assert len(polys[0]) == 1 and len(polys[1]) == 2

    def test_orphan_ccw_ring_promoted_to_shell(self):
        shell = self.cw([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
        orphan = np.array([[100.0, 100], [110, 100], [110, 110], [100, 110], [100, 100]])
        polys = organize_rings([shell, orphan])
        assert len(polys) == 2

    def test_no_cw_ring_fallback(self):
        # QGIS<=3.28 writer bug path (shape2ogr.cpp:333): all-CCW file
        r1 = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
        r2 = np.array([[2.0, 2], [4, 2], [4, 4], [2, 4], [2, 2]])
        polys = organize_rings([r1, r2])
        assert len(polys) == 1 and len(polys[0]) == 2


class TestDbf:
    FIELDS = [
        DbfField("name", "C", 12),
        DbfField("n", "N", 10, 0),
        DbfField("x", "N", 18, 6),
        DbfField("flag", "L", 1),
    ]

    def test_header_roundtrip(self):
        hdr = encode_dbf_header(self.FIELDS, 7)
        nrec, hdr_size, rec_size, fields = decode_dbf_header(hdr)
        assert nrec == 7
        assert rec_size == 1 + 12 + 10 + 18 + 1
        assert [(f.name, f.ftype, f.length, f.decimals) for f in fields] == [
            (f.name, f.ftype, f.length, f.decimals) for f in self.FIELDS
        ]

    def test_record_roundtrip(self):
        rec = encode_dbf_record(self.FIELDS, ["abc", -42, 3.25, True])
        assert decode_dbf_values(rec, self.FIELDS) == ["abc", -42, 3.25, True]

    def test_nulls(self):
        rec = encode_dbf_record(self.FIELDS, [None, None, None, None])
        assert decode_dbf_values(rec, self.FIELDS) == [None, None, None, None]


class TestHandBuiltFixture:
    """A byte-by-byte hand-assembled shapefile (independent of our
    writer) must read back correctly."""

    def build(self, tmpdir):
        # one POINT (7 9) record + dbf with one N field
        content = struct.pack("<idd", SHPT_POINT, 7.0, 9.0)
        rec = struct.pack(">ii", 1, len(content) // 2) + content
        def header(words):
            return (
                struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, words)
                + struct.pack("<ii", 1000, SHPT_POINT)
                + struct.pack("<8d", 7, 9, 7, 9, 0, 0, 0, 0)
            )
        shp = header(50 + len(rec) // 2) + rec
        shx = header(50 + 4) + struct.pack(">ii", 50, len(content) // 2)
        fields = [DbfField("v", "N", 5, 0)]
        dbf = encode_dbf_header(fields, 1) + b" " + b"  123" + b"\x1a"
        base = os.path.join(str(tmpdir), "hand")
        for ext, data in (("shp", shp), ("shx", shx), ("dbf", dbf)):
            with open(f"{base}.{ext}", "wb") as fh:
                fh.write(data)
        return base + ".shp"

    def test_read(self, spark, tmp_path):
        path = self.build(tmp_path)
        rows = read_shapefile(spark, path).collect()
        assert len(rows) == 1
        assert rows[0]["wkt"] == "POINT (7 9)"
        assert rows[0]["v"] == 123

    def test_read_shx(self, tmp_path):
        self.build(tmp_path)
        with open(os.path.join(str(tmp_path), "hand.shx"), "rb") as fh:
            idx = read_shx(fh.read())
        assert idx.tolist() == [[100, 20]]


@pytest.fixture(scope="module")
def written(spark, tmp_path_factory):
    td = tmp_path_factory.mktemp("shp")
    wkts = WKTS + [None, "POINT Z (1 2 7)", "LINESTRING Z (0 0 1, 2 2 3)"]
    df = spark.createDataFrame(
        [(i, w, f"n{i}", i * 10, i + 0.5, i % 2 == 0) for i, w in enumerate(wkts)],
        "fid long, wkt string, name string, n long, x double, flag boolean",
    )
    path = os.path.join(str(td), "layer.shp")
    info = write_shapefile(df, path)
    return path, df, info


class TestSparkRoundTrip:
    def test_info(self, written):
        path, df, info = written
        assert info["records"] == 9
        for ext in (".shp", ".shx", ".dbf"):
            assert os.path.exists(path.replace(".shp", ext))

    def test_attributes_and_geometry(self, written, spark):
        path, df, _ = written
        back = {r["fid"]: r for r in read_shapefile(spark, path).collect()}
        src = {r["fid"]: r for r in df.collect()}
        assert set(back) == set(src)
        for fid, row in back.items():
            s = src[fid]
            assert row["name"] == s["name"] and row["n"] == s["n"]
            assert row["x"] == pytest.approx(s["x"]) and row["flag"] == s["flag"]
            if s["wkt"] is None:
                assert row["wkt"] is None
            else:
                assert geom_signature(row["wkt"]) == geom_signature(
                    to_wkt(parse_wkt([s["wkt"]]))[0]
                )

    def test_z_roundtrip(self, written, spark):
        path, _, _ = written
        back = {r["fid"]: r["wkt"] for r in read_shapefile(spark, path).collect()}
        assert back[7] == "POINT Z (1 2 7)"
        assert back[8] == "LINESTRING Z (0 0 1, 2 2 3)"

    def test_m_roundtrip(self, spark, tmp_path):
        """XYM and XYZM round-trips (shape2ogr.cpp ~280 M dispatch):
        *M records, the optional trailing M block of *Z records, and
        the Z-only-writes-no-M-block rule all in one layer."""
        wkts = [
            "POINT M (1 2 7)",
            "POINT ZM (1 2 3 9)",
            "LINESTRING M (0 0 5, 2 2 6)",
            "LINESTRING ZM (0 0 1 5, 2 2 3 6)",
            "POLYGON M ((0 0 1, 0 4 2, 4 4 3, 0 0 1))",
            "MULTIPOINT M ((1 2 8), (3 4 9))",
            "POINT Z (5 6 7)",  # must come back Z, not ZM-with-zero
        ]
        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(wkts)], "fid long, wkt string"
        )
        path = os.path.join(str(tmp_path), "measured.shp")
        write_shapefile(df, path)
        back = {r["fid"]: r["wkt"] for r in read_shapefile(spark, path).collect()}
        assert back[0] == "POINT M (1 2 7)"
        assert back[1] == "POINT ZM (1 2 3 9)"
        assert back[2] == "LINESTRING M (0 0 5, 2 2 6)"
        assert back[3] == "LINESTRING ZM (0 0 1 5, 2 2 3 6)"
        assert back[4] == "POLYGON M ((0 0 1, 0 4 2, 4 4 3, 0 0 1))"
        assert back[5] == "MULTIPOINT M ((1 2 8), (3 4 9))"
        assert back[6] == "POINT Z (5 6 7)"

    def test_split_parallelism_stable(self, written, spark):
        path, _, _ = written
        one = read_shapefile(spark, path, split_bytes=1 << 26)
        many = read_shapefile(spark, path, split_bytes=64)
        assert many.rdd.getNumPartitions() > one.rdd.getNumPartitions()
        a = sorted((r["fid"], r["wkt"]) for r in one.collect())
        b = sorted((r["fid"], r["wkt"]) for r in many.collect())
        assert a == b

    def test_bbox_prune(self, written, spark):
        path, _, _ = written
        got = sorted(r["fid"] for r in read_shapefile(spark, path, bbox=(19, 19, 31, 31)).collect())
        # only geometries whose extent intersects [19,31]^2: the
        # multipolygon (fid 3); everything else lives near the origin
        assert got == [3]

    def test_infer_fields(self, written):
        _, df, _ = written
        fields = infer_dbf_fields(df)
        assert [f.ftype for f in fields] == ["C", "N", "N", "L"]
        assert [f.decimals > 0 for f in fields] == [False, False, True, False]
