"""RPC transformer tests (alg/gdal_rpc.cpp semantics): exact
polynomial forward (RPCComputeTerms order, +0.5 convention), iterative
inverse round-trip, warp-path pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.geom.rpc import RPCPipeline, RPCTransformer


def _affine_rpc(distort: float = 0.0) -> dict:
    """RPC whose polynomial encodes pixel = 100 + 50*Lnorm (+ optional
    quadratic distortion), line = 80 + 40*Pnorm, DEN = 1 — a sensor
    model with closed-form expectations."""
    ln = np.zeros(20)
    sn = np.zeros(20)
    den = np.zeros(20)
    den[0] = 1.0
    sn[1] = 1.0  # samp ~ normalized longitude
    sn[7] = distort  # + distort * L^2
    ln[2] = 1.0  # line ~ normalized latitude
    return {
        "LINE_OFF": 80.0, "SAMP_OFF": 100.0,
        "LAT_OFF": 45.0, "LONG_OFF": 10.0, "HEIGHT_OFF": 500.0,
        "LINE_SCALE": 40.0, "SAMP_SCALE": 50.0,
        "LAT_SCALE": 0.5, "LONG_SCALE": 0.5, "HEIGHT_SCALE": 100.0,
        "LINE_NUM_COEFF": ln.tolist(), "LINE_DEN_COEFF": den.tolist(),
        "SAMP_NUM_COEFF": sn.tolist(), "SAMP_DEN_COEFF": den.tolist(),
    }


class TestRPC:
    def test_forward_affine_closed_form(self):
        tr = RPCTransformer(_affine_rpc())
        # lon 10.25 -> Lnorm 0.5 -> samp 0.5*50+100+0.5 = 125.5
        px, ln = tr.forward(np.array([10.25]), np.array([45.2]))
        assert px[0] == pytest.approx(125.5, abs=1e-12)
        # lat 45.2 -> Pnorm 0.4 -> line 0.4*40+80+0.5 = 96.5
        assert ln[0] == pytest.approx(96.5, abs=1e-12)

    def test_center_corner_half_pixel(self):
        """At the offset point the polynomial is 0: pixel = OFF + 0.5
        (the RPC center-of-pixel to GDAL corner conversion)."""
        tr = RPCTransformer(_affine_rpc())
        px, ln = tr.forward(np.array([10.0]), np.array([45.0]))
        assert px[0] == 100.5 and ln[0] == 80.5

    def test_height_terms(self):
        rpc = _affine_rpc()
        sn = np.zeros(20)
        sn[1] = 1.0
        sn[3] = 0.1  # + 0.1 * Hnorm
        rpc["SAMP_NUM_COEFF"] = sn.tolist()
        tr = RPCTransformer(rpc, height=600.0)  # Hnorm = 1
        px, _ = tr.forward(np.array([10.0]), np.array([45.0]))
        assert px[0] == pytest.approx(100.5 + 0.1 * 50.0, abs=1e-12)

    def test_inverse_round_trip_affine(self):
        tr = RPCTransformer(_affine_rpc())
        lon, lat = tr.inverse(np.array([125.5]), np.array([96.5]))
        assert lon[0] == pytest.approx(10.25, abs=1e-9)
        assert lat[0] == pytest.approx(45.2, abs=1e-9)

    def test_inverse_round_trip_distorted(self):
        tr = RPCTransformer(_affine_rpc(distort=0.05), pix_err_threshold=1e-6, max_iterations=30)
        lons = np.array([9.8, 10.0, 10.3, 10.45])
        lats = np.array([44.7, 45.0, 45.3, 45.4])
        px, ln = tr.forward(lons, lats)
        rlon, rlat = tr.inverse(px, ln)
        np.testing.assert_allclose(rlon, lons, atol=1e-6)
        np.testing.assert_allclose(rlat, lats, atol=1e-6)

    def test_pipeline_warp_direction(self):
        p = RPCPipeline(_affine_rpc())
        # warp direction: dst world (geo) -> src pixel
        sx, sy = p.inverse(np.array([10.25]), np.array([45.2]))
        assert sx[0] == pytest.approx(125.5) and sy[0] == pytest.approx(96.5)
        # and back
        lon, lat = p.forward(sx, sy)
        assert lon[0] == pytest.approx(10.25, abs=1e-6)

    def test_coefficient_validation(self):
        bad = _affine_rpc()
        bad["LINE_NUM_COEFF"] = [0.0] * 19
        with pytest.raises(ValueError):
            RPCTransformer(bad)
