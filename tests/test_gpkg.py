"""GeoPackage IO tests (operators/gpkg.py).

Mirrors the shapes of the reference's autotest/ogr/ogr_gpkg.py
(create + round-trip + spatial-filter cases) but verifies against
hand-computed GPB bytes and raw sqlite3 queries — the reader under
test never validates itself.
"""

from __future__ import annotations

import os
import sqlite3
import struct

import pytest

from gdal_spark.operators.gpkg import (
    GPKG_APPLICATION_ID,
    decode_gpb,
    encode_gpb,
    gpkg_layers,
    read_gpkg,
    write_gpkg,
)

# ---------------------------------------------------------------------------
# GPB codec: exact bytes pinned by hand
# ---------------------------------------------------------------------------

# NDR WKB for POINT (30 10)
PT_WKB = b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", 30.0, 10.0)


def test_gpb_point_exact_bytes():
    blob = encode_gpb(PT_WKB, 4326, (30.0, 30.0, 10.0, 10.0))
    assert blob[:2] == b"GP"
    assert blob[2] == 0  # version
    # flags: little-endian (bit0) + envelope indicator 1 (bits 1-3)
    assert blob[3] == 0b00000011
    assert struct.unpack_from("<i", blob, 4)[0] == 4326
    assert struct.unpack_from("<4d", blob, 8) == (30.0, 30.0, 10.0, 10.0)
    assert blob[40:] == PT_WKB
    assert len(blob) == 40 + 21


def test_gpb_decode_roundtrip():
    blob = encode_gpb(PT_WKB, 26711, (30.0, 30.0, 10.0, 10.0))
    srs, env, empty, wkb = decode_gpb(blob)
    assert (srs, empty, wkb) == (26711, False, PT_WKB)
    assert env == (30.0, 30.0, 10.0, 10.0)


def test_gpb_big_endian_header_and_xyz_envelope():
    # hand-built: big-endian header flag (bit0 = 0), indicator 2 (XYZ)
    head = b"GP\x00" + bytes([0b00000100]) + struct.pack(">i", 4326)
    env = struct.pack(">6d", 1.0, 2.0, 3.0, 4.0, -5.0, 5.0)
    srs, e, empty, wkb = decode_gpb(head + env + PT_WKB)
    assert srs == 4326 and not empty
    assert e == (1.0, 2.0, 3.0, 4.0, -5.0, 5.0)
    assert wkb == PT_WKB


def test_gpb_rejects():
    with pytest.raises(ValueError, match="GP magic"):
        decode_gpb(b"XX\x00\x03" + b"\x00" * 40)
    with pytest.raises(ValueError, match="version"):
        decode_gpb(b"GP\x09\x03" + b"\x00" * 40)
    with pytest.raises(ValueError, match="Extended"):
        decode_gpb(b"GP\x00" + bytes([0b00100001]) + b"\x00" * 40)
    with pytest.raises(ValueError, match="envelope indicator"):
        decode_gpb(b"GP\x00" + bytes([0b00001011]) + b"\x00" * 40)


# ---------------------------------------------------------------------------
# write + read round-trip
# ---------------------------------------------------------------------------

ROWS = [
    (0, "POINT (30 10)", "alpha", 7, 1.5, True),
    (1, "LINESTRING (0 0, 4 0, 4 3)", "beta", -2, -0.25, False),
    (2, "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))",
     "gamma", 123456789012, 2.5, True),
    (3, "MULTIPOINT ((1 1), (2 2))", None, 0, 0.0, False),
    (4, "MULTIPOLYGON (((20 20, 24 20, 24 24, 20 24, 20 20)))",
     "epsilon", 5, -9.75, True),
    (5, None, "nogeom", 9, 3.25, False),
]
SCHEMA = "fid long, wkt string, name string, n long, x double, flag boolean"


@pytest.fixture(scope="module")
def gpkg_file(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gpkg") / "t.gpkg")
    df = spark.createDataFrame(ROWS, SCHEMA)
    info = write_gpkg(df, path, table="feats", srs_id=4326)
    assert info["records"] == len(ROWS)
    return path


def test_roundtrip_values(spark, gpkg_file):
    got = {
        r["fid"]: (r["wkt"], r["name"], r["n"], r["x"], r["flag"])
        for r in read_gpkg(spark, gpkg_file).collect()
    }
    assert len(got) == len(ROWS)
    from gdal_spark.geom.wkt import parse_wkt, to_wkt

    for fid, wkt, name, n, x, flag in ROWS:
        canon = to_wkt(parse_wkt([wkt]))[0] if wkt is not None else None
        assert got[fid] == (canon, name, n, x, flag), fid


def test_metadata_tables_raw_sqlite(gpkg_file):
    con = sqlite3.connect(gpkg_file)
    try:
        assert con.execute("PRAGMA application_id").fetchone()[0] == GPKG_APPLICATION_ID
        row = con.execute(
            "SELECT data_type, srs_id, min_x, min_y, max_x, max_y "
            "FROM gpkg_contents WHERE table_name='feats'"
        ).fetchone()
        assert row[0] == "features" and row[1] == 4326
        assert (row[2], row[3], row[4], row[5]) == (0.0, 0.0, 30.0, 24.0)
        gc = con.execute(
            "SELECT column_name, geometry_type_name, srs_id, z, m "
            "FROM gpkg_geometry_columns WHERE table_name='feats'"
        ).fetchone()
        assert gc == ("geom", "GEOMETRY", 4326, 0, 0)
        # rtree populated for exactly the non-null geometries
        assert con.execute("SELECT COUNT(*) FROM rtree_feats_geom").fetchone()[0] == 5
        ids = {
            r[0]
            for r in con.execute(
                "SELECT id FROM rtree_feats_geom "
                "WHERE maxx >= 19 AND minx <= 25 AND maxy >= 19 AND miny <= 25"
            )
        }
        assert ids == {4}
        # the stored point blob is byte-exact GPB
        blob = con.execute("SELECT geom FROM feats WHERE fid=0").fetchone()[0]
        assert blob == encode_gpb(PT_WKB, 4326, (30.0, 30.0, 10.0, 10.0))
        # null geometry stored as SQL NULL
        assert con.execute("SELECT geom FROM feats WHERE fid=5").fetchone()[0] is None
    finally:
        con.close()


def test_layers_listing(gpkg_file):
    assert gpkg_layers(gpkg_file) == ["feats"]


def test_bbox_pushdown_rtree(spark, gpkg_file):
    got = sorted(
        r["fid"] for r in read_gpkg(spark, gpkg_file, bbox=(0, 0, 5, 5)).collect()
    )
    # point(30,10) out; line bbox (0..4, 0..3) in; polygon (0..8) in;
    # multipoint (1..2) in; multipolygon (20..24) out; null geom out
    assert got == [1, 2, 3]


def test_bbox_without_rtree_same_result(spark, tmp_path):
    path = str(tmp_path / "noidx.gpkg")
    df = spark.createDataFrame(ROWS, SCHEMA)
    write_gpkg(df, path, table="feats", spatial_index=False)
    con = sqlite3.connect(path)
    assert (
        con.execute(
            "SELECT COUNT(*) FROM sqlite_master WHERE name LIKE 'rtree%'"
        ).fetchone()[0]
        == 0
    )
    con.close()
    got = sorted(
        r["fid"] for r in read_gpkg(spark, path, bbox=(0, 0, 5, 5)).collect()
    )
    assert got == [1, 2, 3]


def test_many_splits_equal_single(spark, gpkg_file):
    one = sorted(
        (r["fid"], r["wkt"]) for r in read_gpkg(spark, gpkg_file).collect()
    )
    many = sorted(
        (r["fid"], r["wkt"])
        for r in read_gpkg(spark, gpkg_file, rows_per_split=2).collect()
    )
    assert one == many and len(one) == len(ROWS)


def test_sparse_fids_and_scale_splits(spark, tmp_path):
    # non-dense fid space: ranges over the id space still find all rows
    path = str(tmp_path / "sparse.gpkg")
    rows = [(i * 1000 + 17, f"POINT ({i} {i})", i) for i in range(40)]
    df = spark.createDataFrame(rows, "fid long, wkt string, v long")
    write_gpkg(df, path, table="pts")
    out = read_gpkg(spark, path, rows_per_split=7)
    assert out.rdd.getNumPartitions() >= 6
    got = sorted((r["fid"], r["v"]) for r in out.collect())
    assert got == [(i * 1000 + 17, i) for i in range(40)]


def test_empty_table(spark, tmp_path):
    path = str(tmp_path / "empty.gpkg")
    df = spark.createDataFrame([], SCHEMA)
    write_gpkg(df, path, table="feats")
    assert read_gpkg(spark, path).count() == 0
