"""ogr2ogr -wrapdateline (ogrgeometryfactory.cpp
CutGeometryOnDateLineAndAddToMulti :3417, SplitLineStringAtDateline
:3137, FixPolygonCoordinatesAtDateLine :3255; autotest
test_ogr2ogr.py:374 test_ogr2ogr_18)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.geom.batch import GeomType
from gdal_spark.geom.dateline import (
    detect_crossing,
    fix_polygon_rings,
    split_linestring,
    wrap_point_lon,
)
from gdal_spark.operators.vector_translate import _wrap_dateline, vector_translate


class TestHelpers:
    def test_wrap_point(self):
        assert wrap_point_lon(190.0) == -170.0
        assert wrap_point_lon(-190.0) == 170.0
        assert wrap_point_lon(170.0) == 170.0
        # 540 = 180 + 360: the reference's fmod form lands on -180
        assert wrap_point_lon(540.0) == -180.0

    def test_detect_bigdiff(self):
        line = [np.array([[179.0, 0.0], [-179.0, 0.0]])]
        branch, around = detect_crossing(line, 10.0)
        assert branch == "bigdiff" and not around

    def test_detect_envelope(self):
        line = [np.array([[170.0, 0.0], [190.0, 0.0]])]
        branch, _ = detect_crossing(line, 10.0)
        assert branch == "rect"

    def test_detect_none(self):
        line = [np.array([[10.0, 0.0], [20.0, 0.0]])]
        assert detect_crossing(line, 10.0)[0] is None

    def test_detect_pole_artifact_ignored(self):
        # a 360-degree jump at lat ~90 is a projection artifact, not a
        # crossing (ogrgeometryfactory.cpp EPSILON block)
        line = [np.array([[-180.0, 90.0], [180.0, 90.0], [180.0, 89.0]])]
        assert detect_crossing(line, 10.0)[0] is None

    def test_split_linestring(self):
        segs = split_linestring(
            np.array([[179.0, 0.0], [-179.0, 2.0]]), 10.0, 0.0
        )
        assert len(segs) == 2
        np.testing.assert_allclose(segs[0], [[179.0, 0.0], [180.0, 1.0]])
        np.testing.assert_allclose(segs[1], [[-180.0, 1.0], [-179.0, 2.0]])

    def test_fix_polygon_rings(self):
        rings = [np.array([[179.0, 40.0], [-179.0, 40.0], [-179.0, 41.0], [179.0, 41.0], [179.0, 40.0]])]
        fixed = fix_polygon_rings(rings, 10.0)[0]
        np.testing.assert_allclose(fixed[:, 0], [179.0, 181.0, 181.0, 179.0, 179.0])


class TestWrapGeometry:
    def test_point_normalized(self):
        t, ps = _wrap_dateline(GeomType.POINT, [[np.array([[190.0, 10.0]])]], 10.0)
        assert t == GeomType.POINT
        np.testing.assert_allclose(ps[0][0], [[-170.0, 10.0]])

    def test_line_split(self):
        t, ps = _wrap_dateline(
            GeomType.LINESTRING, [[np.array([[179.0, 0.0], [-179.0, 0.0]])]], 10.0
        )
        assert t == GeomType.MULTILINESTRING
        assert len(ps) == 2

    def test_polygon_cut_two_parts(self):
        rings = [np.array([[179.0, 40.0], [-179.0, 40.0], [-179.0, 41.0], [179.0, 41.0], [179.0, 40.0]])]
        t, ps = _wrap_dateline(GeomType.POLYGON, [rings], 10.0)
        assert t == GeomType.MULTIPOLYGON and len(ps) == 2
        from gdal_spark.geom.batch import GeomBatchBuilder

        b = GeomBatchBuilder()
        b.add(t, ps)
        batch = b.finish()
        # all lons back in [-180, 180], total area preserved (2 deg^2)
        assert batch.coords[:, 0].min() >= -180.0 and batch.coords[:, 0].max() <= 180.0
        assert batch.areas()[0] == pytest.approx(2.0, rel=1e-9)

    def test_noncrossing_unchanged(self):
        rings = [np.array([[10.0, 0.0], [11.0, 0.0], [11.0, 1.0], [10.0, 1.0], [10.0, 0.0]])]
        t, ps = _wrap_dateline(GeomType.POLYGON, [rings], 10.0)
        assert t == GeomType.POLYGON
        np.testing.assert_allclose(ps[0][0], rings[0])


class TestEndToEnd:
    def test_utm60_polygon(self, spark):
        """The autotest test_ogr2ogr_18 shape: a UTM zone 60 polygon
        straddling the antimeridian reprojects + wraps into a
        MULTIPOLYGON with one part at each side of +-180."""
        from gdal_spark.geom.proj import Pipeline, utm

        df = spark.createDataFrame(
            [(1, "POLYGON((700000 4000000,800000 4000000,800000 3000000,700000 3000000,700000 4000000))")],
            "fid long, wkt string",
        )
        out = vector_translate(
            df, pipeline=Pipeline(src=utm(60)), wrapdateline=True
        ).collect()
        assert len(out) == 1
        wkt = out[0].wkt
        assert wkt.startswith("MULTIPOLYGON")
        from gdal_spark.geom.wkt import parse_wkt

        b = parse_wkt([wkt])
        _, parts = b.geometry(0)
        assert len(parts) == 2
        assert b.coords[:, 0].min() >= -180.0 and b.coords[:, 0].max() <= 180.0
        # autotest expected_wkt bounds: east part lon ~[179.0, 180],
        # west part ~[-180, -179.6]; lat ~[27.09, 36.13]
        assert b.coords[:, 1].min() == pytest.approx(27.09, abs=0.01)
        assert b.coords[:, 1].max() == pytest.approx(36.13, abs=0.01)

    def test_useless_wrapdateline_is_noop(self, spark):
        """test_ogr2ogr_lib_wrapdateline_useless: a small polygon far
        from the dateline passes through unchanged."""
        w = "POLYGON ((-83.05 8.26, -83.05 8.25, -83.053 8.25, -83.053 8.26, -83.05 8.26))"
        df = spark.createDataFrame([(1, w)], "fid long, wkt string")
        out = vector_translate(df, wrapdateline=True).collect()
        assert len(out) == 1
        assert out[0].wkt.startswith("POLYGON")
