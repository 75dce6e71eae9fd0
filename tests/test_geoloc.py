"""Geolocation-array transformer tests (alg/gdalgeoloc.cpp):
bilinear forward with border extension, PIXEL_CENTER convention,
Newton inverse round-trip on a curved field."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.geom.geoloc import GeolocTransformer


def _affine_field(h, w, step=1.0):
    jj, ii = np.meshgrid(np.arange(w) * step, np.arange(h) * step)
    return 1000.0 + 2.0 * jj + 0.5 * ii, 500.0 - 0.25 * jj + 3.0 * ii


class TestGeoloc:
    def test_affine_field_exact(self):
        gx, gy = _affine_field(10, 12)
        tr = GeolocTransformer(gx, gy)
        px = np.array([0.0, 3.5, 11.0, 4.25])
        py = np.array([0.0, 2.25, 9.0, 7.75])
        X, Y = tr.forward(px, py)
        np.testing.assert_allclose(X, 1000 + 2 * px + 0.5 * py, rtol=1e-14)
        np.testing.assert_allclose(Y, 500 - 0.25 * px + 3 * py, rtol=1e-14)

    def test_border_linear_extension(self):
        gx, gy = _affine_field(6, 6)
        tr = GeolocTransformer(gx, gy)
        X, _ = tr.forward(np.array([7.5, -1.0]), np.array([0.0, 0.0]))
        np.testing.assert_allclose(X, 1000 + 2 * np.array([7.5, -1.0]), rtol=1e-12)

    def test_subsampled_grid_offsets(self):
        """PIXEL_STEP/OFFSET: a geoloc grid sampled every 4 source
        pixels starting at pixel 2 (the AVHRR-style layout)."""
        gx, gy = _affine_field(5, 5, step=4.0)  # values for px = 0,4,8,...
        tr = GeolocTransformer(gx, gy, pixel_offset=2.0, pixel_step=4.0, line_offset=2.0, line_step=4.0)
        # source pixel 6 -> grid coord (6-2)/4 = 1.0 -> field at 4.0
        X, Y = tr.forward(np.array([6.0]), np.array([2.0]))
        assert X[0] == pytest.approx(1000 + 2 * 4.0, rel=1e-14)
        assert Y[0] == pytest.approx(500 + 3 * 0.0 - 0.25 * 4.0, rel=1e-14)

    def test_pixel_center_convention(self):
        gx, gy = _affine_field(6, 6)
        top_left = GeolocTransformer(gx, gy, origin_top_left=True)
        center = GeolocTransformer(gx, gy, origin_top_left=False)
        xa, _ = top_left.forward(np.array([3.0]), np.array([3.0]))
        xb, _ = center.forward(np.array([3.5]), np.array([3.5]))
        assert xa[0] == pytest.approx(xb[0], rel=1e-14)

    def test_inverse_round_trip_curved(self):
        jj, ii = np.meshgrid(np.arange(20, dtype=float), np.arange(20, dtype=float))
        gx = 100 + 2 * jj + 0.3 * ii + 0.01 * jj * ii
        gy = 50 + 2.5 * ii - 0.2 * jj + 0.005 * ii * ii
        tr = GeolocTransformer(gx, gy)
        px = np.array([1.5, 7.25, 12.0, 18.5])
        py = np.array([2.5, 9.75, 15.0, 3.25])
        X, Y = tr.forward(px, py)
        rpx, rpy = tr.inverse(X, Y)
        np.testing.assert_allclose(rpx, px, atol=1e-6)
        np.testing.assert_allclose(rpy, py, atol=1e-6)

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            GeolocTransformer(np.zeros((3, 3)), np.zeros((4, 3)))
