"""Property-based tests (hypothesis) for the pure-numpy kernels.

The reference's autotest suite leans on fixed fixtures; these add
randomized invariants over the geometry/projection/overlay kernels —
the parts where a silent numerical regression would corrupt every
downstream operator. All driver-side math: no SparkSession needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.geom.wkt import parse_wkt, to_wkt
from gdal_spark.geom.overlay import overlay, region_area, snap_cell_area
from gdal_spark.geom.predicates import points_in_edges, rings_to_edges
from gdal_spark.geom.proj import (
    AlbersEqualArea,
    GRS80,
    LambertConformalConic,
    lonlat_to_webmercator,
    utm,
    webmercator_to_lonlat,
)

coord = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64).map(
    lambda v: round(v, 3)
)


def overlay_area(a, b, op):
    return region_area(overlay(a, b, op))


def _snap_atol(a, b, ra, rb):
    # snap-rounded overlay moves each boundary by <= one grid cell:
    # the induced area error is bounded by cell-size * total perimeter
    cell = np.sqrt(snap_cell_area(a, b))
    perim = 2 * (ra[2] + ra[3] + rb[2] + rb[3])
    return 32.0 * cell * perim + 1e-12


def _rect_wkt(x, y, w, h):
    x2, y2 = x + w, y + h
    return f"POLYGON (({x} {y},{x} {y2},{x2} {y2},{x2} {y},{x} {y}))"


rect = st.tuples(
    coord,
    coord,
    st.floats(min_value=0.01, max_value=1e4, allow_nan=False).map(lambda v: round(v, 3)),
    st.floats(min_value=0.01, max_value=1e4, allow_nan=False).map(lambda v: round(v, 3)),
)


class TestWktRoundTrip:
    @given(st.lists(st.tuples(coord, coord), min_size=1, max_size=8))
    @settings(max_examples=200, deadline=None)
    def test_point_roundtrip(self, pts):
        wkts = [f"POINT ({x} {y})" for x, y in pts]
        again = to_wkt(parse_wkt(wkts))
        batch2 = parse_wkt(list(again))
        for i, (x, y) in enumerate(pts):
            rings = batch2.polygon_rings(i)
            assert rings[0][0][0] == x and rings[0][0][1] == y

    @given(rect)
    @settings(max_examples=200, deadline=None)
    def test_polygon_roundtrip_area(self, r):
        x, y, w, h = r
        b = parse_wkt([_rect_wkt(x, y, w, h)])
        assert np.isclose(b.areas()[0], (x + w - x) * (y + h - y), rtol=1e-9)
        b2 = parse_wkt(list(to_wkt(b)))
        assert np.isclose(b2.areas()[0], b.areas()[0], rtol=0, atol=0)


class TestOverlayInvariants:
    @given(rect, rect)
    @settings(max_examples=100, deadline=None)
    def test_partition_of_area(self, ra, rb):
        """area(A∩B) + area(A\\B) == area(A) for random rectangles —
        the defining identity of any overlay kernel."""
        a = [parse_wkt([_rect_wkt(*ra)]).polygon_rings(0)]
        b = [parse_wkt([_rect_wkt(*rb)]).polygon_rings(0)]
        area_a = ra[2] * ra[3]
        inter = overlay_area(a, b, "and")
        diff = overlay_area(a, b, "a_not_b")
        assert np.isclose(inter + diff, area_a, rtol=1e-6, atol=_snap_atol(a, b, ra, rb))

    @given(rect, rect)
    @settings(max_examples=100, deadline=None)
    def test_intersection_symmetry_and_bounds(self, ra, rb):
        a = [parse_wkt([_rect_wkt(*ra)]).polygon_rings(0)]
        b = [parse_wkt([_rect_wkt(*rb)]).polygon_rings(0)]
        iab = overlay_area(a, b, "and")
        iba = overlay_area(b, a, "and")
        atol = _snap_atol(a, b, ra, rb)
        assert np.isclose(iab, iba, rtol=1e-9, atol=atol)
        assert iab <= min(ra[2] * ra[3], rb[2] * rb[3]) + atol
        # exact rectangle-overlap oracle
        ox = max(0.0, min(ra[0] + ra[2], rb[0] + rb[2]) - max(ra[0], rb[0]))
        oy = max(0.0, min(ra[1] + ra[3], rb[1] + rb[3]) - max(ra[1], rb[1]))
        assert np.isclose(iab, ox * oy, rtol=1e-6, atol=atol)


class TestRayCast:
    @given(rect, st.tuples(coord, coord))
    @settings(max_examples=200, deadline=None)
    def test_rect_raycast_matches_interval_test(self, r, p):
        x, y, w, h = r
        px, py = p
        rings = parse_wkt([_rect_wkt(x, y, w, h)]).polygon_rings(0)
        got = points_in_edges(np.array([px]), np.array([py]), rings_to_edges(rings))[0]
        want = (x <= px <= x + w) and (y <= py <= y + h)  # closed rect
        assert got == want


class TestProjectionRoundTrips:
    lon = st.floats(min_value=-119.9, max_value=-114.1, allow_nan=False)
    lat = st.floats(min_value=20.0, max_value=60.0, allow_nan=False)

    @given(lon, lat)
    @settings(max_examples=200, deadline=None)
    def test_utm_roundtrip(self, lo, la):
        tm = utm(11)
        x, y = tm.forward(np.array([lo]), np.array([la]))
        lo2, la2 = tm.inverse(x, y)
        assert abs(lo2[0] - lo) < 1e-8 and abs(la2[0] - la) < 1e-8  # ~1mm

    @given(lon, lat)
    @settings(max_examples=200, deadline=None)
    def test_webmercator_roundtrip(self, lo, la):
        x, y = lonlat_to_webmercator(np.array([lo]), np.array([la]))
        lo2, la2 = webmercator_to_lonlat(x, y)
        assert abs(lo2[0] - lo) < 1e-9 and abs(la2[0] - la) < 1e-9

    @given(st.floats(min_value=-130, max_value=-60), st.floats(min_value=25, max_value=49))
    @settings(max_examples=200, deadline=None)
    def test_conus_lcc_albers_roundtrip(self, lo, la):
        lcc = LambertConformalConic(
            ellipsoid=GRS80, lat1_deg=33.0, lat2_deg=45.0, lat0_deg=23.0, lon0_deg=-96.0
        )
        aea = AlbersEqualArea(
            ellipsoid=GRS80, lat1_deg=29.5, lat2_deg=45.5, lat0_deg=23.0, lon0_deg=-96.0
        )
        for prj in (lcc, aea):
            x, y = prj.forward(np.array([lo]), np.array([la]))
            lo2, la2 = prj.inverse(x, y)
            assert abs(lo2[0] - lo) < 1e-7 and abs(la2[0] - la) < 1e-7


class TestOverlayScaleSweep:
    """The round-2 advice bug class: the snap frame must ADAPT to the
    coordinate magnitude.  Sweep extents across 15 orders of magnitude
    and require the defining overlay identities to hold at every
    scale (the fixed-1/64-unit grid failed below ~1e-2)."""

    @given(
        st.floats(min_value=1.0, max_value=9.9, allow_nan=False),
        st.integers(min_value=-8, max_value=7),
        st.floats(min_value=0.1, max_value=0.4, allow_nan=False),
    )
    @settings(max_examples=120, deadline=None)
    def test_partition_identity_across_magnitudes(self, mant, expo, frac):
        s = mant * (10.0 ** expo)  # rect size spanning 1e-8 .. ~1e8
        ra = (s, s, s, s)  # offset == size: coordinates ~2s
        rb = (s + frac * s, s + frac * s, s, s)  # overlapping copy
        a = [parse_wkt([_rect_wkt(*ra)]).polygon_rings(0)]
        b = [parse_wkt([_rect_wkt(*rb)]).polygon_rings(0)]
        area_a = s * s
        inter = overlay_area(a, b, "and")
        diff = overlay_area(a, b, "a_not_b")
        atol = _snap_atol(a, b, ra, rb)
        assert np.isclose(inter + diff, area_a, rtol=1e-6, atol=atol)
        # exact rectangle-overlap oracle at this scale
        want = ((1.0 - frac) * s) ** 2
        assert np.isclose(inter, want, rtol=1e-5, atol=atol)

    @given(st.integers(min_value=-8, max_value=7))
    @settings(max_examples=32, deadline=None)
    def test_strict_nesting_across_magnitudes(self, expo):
        s = 10.0 ** expo
        from gdal_spark.geom.relate import Geometry, contains, equals, within

        outer = Geometry.from_wkt(_rect_wkt(2 * s, 2 * s, s, s))
        inner = Geometry.from_wkt(_rect_wkt(2 * s + 0.25 * s, 2 * s + 0.25 * s, 0.5 * s, 0.5 * s))
        far = Geometry.from_wkt(_rect_wkt(90 * s, 90 * s, s, s))
        assert within(inner, outer)
        assert contains(outer, inner)
        assert not equals(outer, far)
        assert not within(inner, far)
