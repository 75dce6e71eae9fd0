"""Round-3 projection families: Polar Stereographic, Lambert
Azimuthal Equal-Area, Sinusoidal (Snyder PP 1395 formulas) —
round-trip, scale-at-standard-parallel, and equal-area invariants."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.geom.proj import (
    EPSG_3031,
    EPSG_3035,
    EPSG_3413,
    GRS80,
    MODIS_SINUSOIDAL,
    WGS84,
)


def _roundtrip(proj, lons, lats, tol=1e-9):
    x, y = proj.forward(lons, lats)
    rlon, rlat = proj.inverse(x, y)
    np.testing.assert_allclose(rlon, lons, atol=tol)
    np.testing.assert_allclose(rlat, lats, atol=tol)


def _jacobian_area(proj, lon, lat, d=1e-5):
    """|d(x,y)/d(lon,lat)| in m^2 per deg^2 via central differences."""
    x0, y0 = proj.forward(np.array([lon - d, lon + d, lon, lon]), np.array([lat, lat, lat - d, lat + d]))
    dx_dlon = (x0[1] - x0[0]) / (2 * d)
    dy_dlon = (y0[1] - y0[0]) / (2 * d)
    dx_dlat = (x0[3] - x0[2]) / (2 * d)
    dy_dlat = (y0[3] - y0[2]) / (2 * d)
    return abs(dx_dlon * dy_dlat - dx_dlat * dy_dlon)


def _ellipsoid_cell_area(ell, lat_deg):
    """True ellipsoid area of a 1-deg^2 cell at lat (M * N * cos)."""
    lat = np.radians(lat_deg)
    e2 = ell.e2
    s2 = np.sin(lat) ** 2
    M = ell.a * (1 - e2) / (1 - e2 * s2) ** 1.5
    N = ell.a / np.sqrt(1 - e2 * s2)
    return M * N * np.cos(lat) * np.radians(1.0) ** 2


class TestPolarStereographic:
    def test_roundtrip_south(self):
        _roundtrip(
            EPSG_3031,
            np.array([-180.0 + 1e-6, -90.0, 0.0, 45.0, 170.0]),
            np.array([-65.0, -71.0, -80.0, -89.0, -72.5]),
        )

    def test_roundtrip_north(self):
        _roundtrip(
            EPSG_3413,
            np.array([-140.0, -45.0, 0.0, 60.0, 179.0]),
            np.array([60.0, 70.0, 85.0, 89.5, 66.0]),
        )

    def test_pole_at_origin(self):
        x, y = EPSG_3031.forward(np.array([123.0]), np.array([-90.0]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
        x, y = EPSG_3413.forward(np.array([0.0]), np.array([90.0]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6

    def test_scale_true_at_standard_parallel(self):
        """Along the lat_ts parallel the local scale factor is 1."""
        lat = 70.0
        lon = 10.0
        d = 1e-5
        x, y = EPSG_3413.forward(np.array([lon - d, lon + d]), np.array([lat, lat]))
        proj_d = np.hypot(x[1] - x[0], y[1] - y[0])
        e2 = WGS84.e2
        N = WGS84.a / np.sqrt(1 - e2 * np.sin(np.radians(lat)) ** 2)
        true_d = N * np.cos(np.radians(lat)) * np.radians(2 * d)
        assert abs(proj_d / true_d - 1) < 1e-7

    def test_central_meridian_vertical(self):
        # EPSG:3413 lon0 = -45: points on that meridian have x = 0
        x, _ = EPSG_3413.forward(np.array([-45.0, -45.0]), np.array([70.0, 80.0]))
        np.testing.assert_allclose(x, 0.0, atol=1e-6)


class TestLAEA:
    def test_roundtrip_europe(self):
        _roundtrip(
            EPSG_3035,
            np.array([-10.0, 3.0, 10.0, 25.0, 31.0]),
            np.array([35.0, 46.5, 52.0, 60.0, 70.0]),
            tol=1e-8,
        )

    def test_false_origin_at_center(self):
        x, y = EPSG_3035.forward(np.array([10.0]), np.array([52.0]))
        assert x[0] == pytest.approx(4_321_000.0, abs=1e-6)
        assert y[0] == pytest.approx(3_210_000.0, abs=1e-6)

    def test_equal_area_property(self):
        """The Jacobian area equals the true ellipsoid cell area
        everywhere (the defining property)."""
        for lon, lat in [(10.0, 52.0), (-8.0, 38.0), (28.0, 65.0)]:
            j = _jacobian_area(EPSG_3035, lon, lat)
            assert j == pytest.approx(_ellipsoid_cell_area(GRS80, lat), rel=1e-6)


class TestSinusoidal:
    def test_roundtrip(self):
        _roundtrip(
            MODIS_SINUSOIDAL,
            np.array([-170.0, -60.0, 0.0, 60.0, 170.0]),
            np.array([-80.0, -30.0, 0.0, 45.0, 80.0]),
        )

    def test_equator_scale(self):
        # at the equator x = R * lon (radians)
        x, y = MODIS_SINUSOIDAL.forward(np.array([1.0]), np.array([0.0]))
        assert x[0] == pytest.approx(6371007.181 * np.pi / 180, rel=1e-12)
        assert y[0] == 0.0

    def test_equal_area_property(self):
        R = 6371007.181
        for lon, lat in [(0.0, 0.0), (45.0, 40.0), (-120.0, -55.0)]:
            j = _jacobian_area(MODIS_SINUSOIDAL, lon, lat)
            want = R * R * np.cos(np.radians(lat)) * np.radians(1.0) ** 2
            assert j == pytest.approx(want, rel=1e-6)
