"""`gdal vector set-geom-type` + the forceTo linear-lattice rules
(apps/gdalalg_vector_set_geom_type.cpp; ogr/ogrgeometryfactory.cpp:5229
forceTo and its forceTo{LineString,Polygon,Multi*} helpers)."""

from __future__ import annotations

import pandas as pd
import pytest

from gdal_spark.operators.vector_translate import set_geom_type


def _one(spark, wkt, **kw):
    df = spark.createDataFrame(pd.DataFrame({"fid": [0], "geom": [wkt]}))
    rows = set_geom_type(df, **kw).collect()
    return rows[0].geom if rows else None


@pytest.mark.parametrize("wkt,kw,expected", [
    # --multi: atomic wraps, multi/GC unchanged
    ("POINT (1 2)", dict(multi=True), "MULTIPOINT ((1 2))"),
    ("LINESTRING (0 0,1 1)", dict(multi=True), "MULTILINESTRING ((0 0,1 1))"),
    ("POLYGON ((0 0,0 1,1 1,1 0,0 0))", dict(multi=True), "MULTIPOLYGON (((0 0,0 1,1 1,1 0,0 0)))"),
    ("MULTIPOINT ((1 2),(3 4))", dict(multi=True), "MULTIPOINT ((1 2),(3 4))"),
    ("GEOMETRYCOLLECTION (POINT (1 2))", dict(multi=True), "GEOMETRYCOLLECTION (POINT (1 2))"),
    # --single: single-member escapes, the MLS endpoint-merge loop runs
    ("MULTIPOLYGON (((0 0,0 1,1 1,1 0,0 0)))", dict(single=True), "POLYGON ((0 0,0 1,1 1,1 0,0 0))"),
    ("MULTIPOINT ((7 8))", dict(single=True), "POINT (7 8)"),
    ("MULTILINESTRING ((0 0,1 1),(1 1,2 2))", dict(single=True), "LINESTRING (0 0,1 1,2 2)"),
    ("MULTILINESTRING ((1 1,2 2),(0 0,1 1))", dict(single=True), "LINESTRING (0 0,1 1,2 2)"),
    ("MULTILINESTRING ((0 0,1 1),(5 5,6 6))", dict(single=True), "MULTILINESTRING ((0 0,1 1),(5 5,6 6))"),
    # explicit type: closed-line -> polygon, open line unchanged
    ("LINESTRING (0 0,1 0,1 1,0 0)", dict(geom_type="polygon"), "POLYGON ((0 0,1 0,1 1,0 0))"),
    ("LINESTRING (0 0,1 0)", dict(geom_type="polygon"), "LINESTRING (0 0,1 0)"),
    # forceToPolygon aggregates EVERY ring of every polygon member
    ("MULTIPOLYGON (((0 0,0 1,1 1,0 0)),((2 2,2 3,3 3,2 2),(9 9,9 8,8 8,9 9)))",
     dict(geom_type="polygon"),
     "POLYGON ((0 0,0 1,1 1,0 0),(2 2,2 3,3 3,2 2),(9 9,9 8,8 8,9 9))"),
    # GC -> POLYGON skips non-polygon members
    ("GEOMETRYCOLLECTION (POINT (5 5),POLYGON ((0 0,0 1,1 1,0 0)))",
     dict(geom_type="polygon"), "POLYGON ((0 0,0 1,1 1,0 0))"),
    # GC of points promotes to MULTIPOINT; mixed GC does not
    ("GEOMETRYCOLLECTION (POINT (1 1),POINT (2 2))", dict(geom_type="multipoint"),
     "MULTIPOINT ((1 1),(2 2))"),
    ("GEOMETRYCOLLECTION (POINT (1 1),LINESTRING (0 0,1 1))", dict(geom_type="multipoint"),
     "GEOMETRYCOLLECTION (POINT (1 1),LINESTRING (0 0,1 1))"),
    # polygon rings become linestrings
    ("POLYGON ((0 0,0 2,2 2,2 0,0 0),(1 1,1.5 1,1 1.5,1 1))", dict(geom_type="multilinestring"),
     "MULTILINESTRING ((0 0,0 2,2 2,2 0,0 0),(1 1,1.5 1,1 1.5,1 1))"),
    # single-ring polygon -> its exterior ring as a LINESTRING; holes block it
    ("POLYGON ((0 0,0 1,1 1,0 0))", dict(geom_type="linestring"), "LINESTRING (0 0,0 1,1 1,0 0)"),
    ("POLYGON ((0 0,0 9,9 9,0 0),(1 1,2 1,1 2,1 1))", dict(geom_type="linestring"),
     "POLYGON ((0 0,0 9,9 9,0 0),(1 1,2 1,1 2,1 1))"),
    # closed linestring -> MULTIPOLYGON via the POLYGON route
    ("LINESTRING (0 0,1 0,1 1,0 0)", dict(geom_type="multipolygon"),
     "MULTIPOLYGON (((0 0,1 0,1 1,0 0)))"),
    # GC target wraps anything; multis contribute their members
    ("POINT (1 2)", dict(geom_type="geometrycollection"), "GEOMETRYCOLLECTION (POINT (1 2))"),
    # empty input -> empty of the target type
    ("POINT EMPTY", dict(geom_type="multipolygon"), "MULTIPOLYGON EMPTY"),
    # NULL passes through
    (None, dict(multi=True), None),
])
def test_force_matrix(spark, wkt, kw, expected):
    assert _one(spark, wkt, **kw) == expected


def test_skip_drops_unconverted(spark):
    df = spark.createDataFrame(pd.DataFrame({"fid": [0, 1, 2], "geom": [
        "POINT (1 2)",                    # cannot become polygon -> dropped
        "LINESTRING (0 0,1 0,1 1,0 0)",   # closed -> converts -> kept
        None,                             # NULL never skipped
    ]}))
    out = {r.fid: r.geom for r in set_geom_type(df, geom_type="polygon", skip=True).collect()}
    assert set(out) == {1, 2}
    assert out[1] == "POLYGON ((0 0,1 0,1 1,0 0))"
    assert out[2] is None


def test_bad_args(spark):
    df = spark.createDataFrame(pd.DataFrame({"geom": ["POINT (1 2)"]}))
    with pytest.raises(ValueError, match="mutually exclusive"):
        set_geom_type(df, multi=True, single=True)
    with pytest.raises(ValueError, match="needs"):
        set_geom_type(df)
