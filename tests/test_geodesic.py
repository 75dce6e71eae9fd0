"""Geodesic length/area tests against closed-form ellipsoid fixtures
(equator arcs, Helmert meridian-arc series, exact ellipsoidal zone
areas) — the reference surface is ST_Area/ST_Length(use_ellipsoid=1),
ogrsqlitesqlfunctions.cpp:636,681."""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.geom.geodesic import (
    AUTHALIC_RADIUS,
    WGS84_A,
    WGS84_F,
    _q,
    geodesic_line_length,
    geodesic_polygon_area,
    spherical_excess_area,
    vincenty_lengths,
)

E2 = WGS84_F * (2 - WGS84_F)


def meridian_arc(lat_deg: float) -> float:
    """Helmert series for the meridian arc from the equator (exact to
    sub-mm for Earth's eccentricity) — independent closed form."""
    phi = math.radians(lat_deg)
    e2, e4, e6 = E2, E2**2, E2**3
    a0 = 1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256
    a2 = 3.0 / 8 * (e2 + e4 / 4 + 15 * e6 / 128)
    a4 = 15.0 / 256 * (e4 + 3 * e6 / 4)
    a6 = 35.0 * e6 / 3072
    return WGS84_A * (
        a0 * phi - a2 * math.sin(2 * phi) + a4 * math.sin(4 * phi) - a6 * math.sin(6 * phi)
    )


def zone_area(lat_deg: float, dlon_deg: float) -> float:
    """Exact ellipsoid area between the equator and a parallel over a
    longitude band: A = a^2 * dlon/2 * q(lat)."""
    return WGS84_A**2 * math.radians(dlon_deg) / 2 * float(_q(np.array([math.sin(math.radians(lat_deg))]))[0])


class TestVincenty:
    def test_equator_exact(self):
        # the equator is a geodesic: s = a * dlon exactly
        got = vincenty_lengths([0.0], [0.0], [1.0], [0.0])[0]
        assert got == pytest.approx(WGS84_A * math.pi / 180, abs=1e-8)
        got90 = vincenty_lengths([10.0], [0.0], [100.0], [0.0])[0]
        assert got90 == pytest.approx(WGS84_A * math.pi / 2, abs=1e-7)

    def test_meridian_matches_helmert_series(self):
        for lat in (10.0, 45.0, 80.0):
            got = vincenty_lengths([7.0], [0.0], [7.0], [lat])[0]
            assert got == pytest.approx(meridian_arc(lat), abs=1e-3), lat

    def test_coincident_zero(self):
        assert vincenty_lengths([5.0], [5.0], [5.0], [5.0])[0] == 0.0

    def test_oblique_sanity(self):
        # 1 degree diagonal at mid-latitudes: between the flat-earth
        # lower bound and the sphere upper bound, ~130-140 km
        got = vincenty_lengths([10.0], [45.0], [11.0], [46.0])[0]
        assert 130_000 < got < 140_000

    def test_line_length_sums_segments(self):
        line = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
        want = (
            vincenty_lengths([0.0], [0.0], [1.0], [0.0])[0]
            + vincenty_lengths([1.0], [0.0], [1.0], [1.0])[0]
        )
        assert geodesic_line_length(line) == pytest.approx(want, rel=1e-15)


class TestGeodesicArea:
    def test_zone_quadrilateral_exact(self):
        """Equator + two meridians + densified parallel -> the exact
        ellipsoidal zone area (authalic mapping preserves it)."""
        lat, dlon, n = 50.0, 30.0, 3000
        top = [(dlon - dlon * i / n, lat) for i in range(n + 1)]
        ring = np.array([(0.0, 0.0), (dlon, 0.0)] + top + [(0.0, 0.0)])
        got = geodesic_polygon_area([ring])
        assert got == pytest.approx(zone_area(lat, dlon), rel=1e-6)

    def test_whole_sphere_consistency(self):
        # total surface area via the authalic radius
        assert 4 * math.pi * AUTHALIC_RADIUS**2 == pytest.approx(
            2 * math.pi * WGS84_A**2 * float(_q(np.array([1.0]))[0]), rel=1e-14
        )

    def test_orientation_sign_and_abs(self):
        ring = np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)])
        ccw = spherical_excess_area(ring)
        cw = spherical_excess_area(ring[::-1])
        assert ccw == pytest.approx(-cw, rel=1e-12) and ccw > 0
        assert geodesic_polygon_area([ring[::-1]]) == pytest.approx(ccw, rel=1e-12)

    def test_hole_subtracted(self):
        shell = np.array([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)])
        hole = np.array([(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (0.5, 0.5)])
        a = geodesic_polygon_area([shell, hole])
        assert a == pytest.approx(
            geodesic_polygon_area([shell]) - geodesic_polygon_area([hole]), rel=1e-12
        )

    def test_one_degree_cell_magnitude(self):
        # 1x1 degree cell at the equator ~ 12,300-12,400 km^2
        ring = np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)])
        a = geodesic_polygon_area([ring])
        assert 12.25e9 < a < 12.45e9


class TestSparkSurface:
    def test_sql_registration(self, spark):
        from pyspark.sql import Row

        from gdal_spark.operators.st_funcs import register_st_functions

        register_st_functions(spark)
        df = spark.createDataFrame(
            [Row(w="POLYGON((0 0,1 0,1 1,0 1,0 0))"), Row(w="LINESTRING(0 0,1 0)")]
        )
        df.createOrReplaceTempView("gg")
        rows = spark.sql(
            "SELECT ST_GeodesicArea(w) AS a, ST_GeodesicLength(w) AS l FROM gg"
        ).collect()
        assert rows[0].a == pytest.approx(12.3e9, rel=0.02)
        assert rows[1].l == pytest.approx(WGS84_A * math.pi / 180, abs=1e-6)
        assert rows[1].a == 0.0
