"""Curve geometry linearization tests (ogrgeometryfactory.cpp
curveToLineString / GetCurveParameters / StrokeArc semantics;
autotest/ogr/ogr_geom.py curve WKT coverage)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.geom.batch import GeomType
from gdal_spark.geom.curves import curve_to_linestring, get_curve_parameters
from gdal_spark.geom.wkt import parse_wkt


def _geom(wkt):
    b, errs = parse_wkt([wkt], return_errors=True)
    assert errs[0] is None, errs[0]
    return b.geometry(0)


class TestCurveParameters:
    def test_half_circle(self):
        ok, R, cx, cy, a0, a1, a2 = get_curve_parameters(0, 0, 1, 1, 2, 0)
        assert ok and R == pytest.approx(1.0) and (cx, cy) == (pytest.approx(1.0), pytest.approx(0.0))
        assert a2 - a0 == pytest.approx(-math.pi)  # clockwise half turn

    def test_collinear_rejected(self):
        ok, *_ = get_curve_parameters(0, 0, 1, 1, 2, 2)
        assert not ok

    def test_full_circle(self):
        ok, R, cx, cy, a0, a1, a2 = get_curve_parameters(0, 0, 2, 0, 0, 0)
        assert ok and (cx, cy) == (1.0, 0.0) and R == 1.0
        assert a2 - a0 == pytest.approx(2 * math.pi)


class TestCurveToLineString:
    def test_vertices_on_circle_4deg_step(self):
        seg = curve_to_linestring(0, 0, 1, 1, 2, 0)
        # 180 deg at 4 deg default step -> 45 slices -> 46 vertices
        assert len(seg) == 46
        np.testing.assert_allclose(np.hypot(seg[:, 0] - 1, seg[:, 1]), 1.0, rtol=1e-12)
        np.testing.assert_allclose(seg[0], (0, 0))
        np.testing.assert_allclose(seg[-1], (2, 0))

    def test_direction_symmetry_bit_identical(self):
        fwd = curve_to_linestring(0, 0, 1, 1, 2, 0)
        rev = curve_to_linestring(2, 0, 1, 1, 0, 0)
        np.testing.assert_array_equal(fwd, rev[::-1])

    def test_collinear_three_points(self):
        seg = curve_to_linestring(0, 0, 1, 1, 2, 2)
        np.testing.assert_array_equal(seg, [(0, 0), (1, 1), (2, 2)])

    def test_min_four_slices_for_tiny_arc(self):
        # a 1-degree arc still gets >= 4 slices (StrokeArc nSteps min)
        t = math.radians(1.0)
        seg = curve_to_linestring(1, 0, math.cos(t / 2), math.sin(t / 2), math.cos(t), math.sin(t))
        assert len(seg) >= 5


class TestCurveWkt:
    def test_circularstring_parses_to_linestring(self):
        gtype, parts = _geom("CIRCULARSTRING (0 0,1 1,2 0)")
        assert GeomType(gtype) == GeomType.LINESTRING
        assert len(parts[0][0]) == 46

    def test_multi_arc_circularstring_joint_not_duplicated(self):
        gtype, parts = _geom("CIRCULARSTRING (0 0,1 1,2 0,3 -1,4 0)")
        line = parts[0][0]
        assert GeomType(gtype) == GeomType.LINESTRING
        d = np.linalg.norm(np.diff(line, axis=0), axis=1)
        assert (d > 0).all()  # no zero-length duplicate at (2,0)
        assert len(line) == 46 + 45

    def test_compoundcurve(self):
        gtype, parts = _geom("COMPOUNDCURVE (CIRCULARSTRING (0 0,1 1,2 0),(2 0,4 0,4 2))")
        line = parts[0][0]
        assert GeomType(gtype) == GeomType.LINESTRING
        np.testing.assert_allclose(line[-1], (4, 2))
        d = np.linalg.norm(np.diff(line, axis=0), axis=1)
        assert (d > 0).all()
        assert len(line) == 46 + 2

    def test_curvepolygon_full_circle_area(self):
        gtype, parts = _geom("CURVEPOLYGON (CIRCULARSTRING (0 0,2 2,4 0,2 -2,0 0))")
        assert GeomType(gtype) == GeomType.POLYGON
        ring = parts[0][0]
        assert (ring[0] == ring[-1]).all()
        x, y = ring[:, 0], ring[:, 1]
        area = 0.5 * abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
        assert area == pytest.approx(math.pi * 4, rel=2e-3)  # inscribed polygon

    def test_curvepolygon_mixed_rings(self):
        gtype, parts = _geom(
            "CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (0 0,10 10,20 0),(20 0,0 0)),(5 2,9 2,9 5,5 5,5 2))"
        )
        assert GeomType(gtype) == GeomType.POLYGON
        assert len(parts[0]) == 2  # shell + hole

    def test_multicurve(self):
        gtype, parts = _geom("MULTICURVE ((0 0,5 5),CIRCULARSTRING (4 0,4 4,8 4))")
        assert GeomType(gtype) == GeomType.MULTILINESTRING
        assert len(parts) == 2 and len(parts[1][0]) > 10

    def test_multisurface(self):
        gtype, parts = _geom(
            "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (0 0,2 2,4 0,2 -2,0 0)),((10 10,10 11,11 11,10 10)))"
        )
        assert GeomType(gtype) == GeomType.MULTIPOLYGON
        assert len(parts) == 2

    def test_empty_and_z_variants(self):
        gtype, parts = _geom("CIRCULARSTRING EMPTY")
        assert GeomType(gtype) == GeomType.LINESTRING and parts == []
        gtype, parts = _geom("CIRCULARSTRING Z (0 0 5,1 1 5,2 0 5)")
        assert GeomType(gtype) == GeomType.LINESTRING and len(parts[0][0]) == 46

    def test_bad_curve_routed_to_error_column(self):
        b, errs = parse_wkt(["CIRCULARSTRING (0 0,1 1)"], return_errors=True)
        assert errs[0] is not None and b.is_null[0]

    def test_envelope_beyond_control_points(self):
        """The stroked arc bulges below the chord: envelope must
        extend past the control-point bbox (the arc-envelope property
        the driver query oracles)."""
        _, parts = _geom("CIRCULARSTRING (0 0,1 -1,2 0)")
        line = parts[0][0]
        assert line[:, 1].min() == pytest.approx(-1.0, abs=1e-3)
        assert line[:, 1].min() <= -0.99
