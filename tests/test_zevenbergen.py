"""gdaldem -alg ZevenbergenThorne for slope / aspect / hillshade (all
four variants): scalar C-loop transliterations vs the vectorized
kernels, and distributed == local."""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.focal import (
    aspect,
    focal_apply_local,
    hillshade,
    hillshade_gradient_kernel,
    slope,
    zt_aspect_kernel,
    zt_slope_kernel,
)
from gdal_spark.operators.raster import materialize_full

FSPEC = dataclasses.replace(BYTE20_SPEC, dtype="float64")
EW, NS = BYTE20_SPEC.gt[1], BYTE20_SPEC.gt[5]


def _win(p, i, j):
    # afWin[0..8] row-major over the padded array (p already padded)
    return [p[i + dy, j + dx] for dy in range(3) for dx in range(3)]


def _pad():
    return np.pad(BYTE20.astype(np.float64), 1, mode="edge")


def test_zt_slope_scalar_parity():
    p = _pad()
    k = zt_slope_kernel(abs(EW), abs(NS))(p)
    for i, j in [(0, 0), (3, 7), (10, 10), (19, 19), (5, 0)]:
        w = _win(p, i, j)
        dx = (w[3] - w[5]) / abs(EW)
        dy = (w[7] - w[1]) / abs(NS)
        exp = np.degrees(np.arctan(np.sqrt(dx * dx + dy * dy) * 0.5))
        assert k[i, j] == pytest.approx(exp, abs=1e-12)


def test_zt_aspect_scalar_parity():
    p = _pad()
    k = zt_aspect_kernel()(p)
    for i, j in [(0, 0), (3, 7), (10, 10), (19, 19)]:
        w = _win(p, i, j)
        dx = w[5] - w[3]
        dy = w[7] - w[1]
        if dx == 0 and dy == 0:
            exp = -9999.0
        else:
            exp = np.degrees(np.arctan2(dy, -dx))
            exp = 450.0 - exp if exp > 90.0 else 90.0 - exp
            if exp == 360.0:
                exp = 0.0
        assert k[i, j] == pytest.approx(exp, abs=1e-12)


def test_zt_hillshade_regular_scalar_parity():
    p = _pad()
    az, alt, z = 315.0, 45.0, 2.0
    k = hillshade_gradient_kernel(EW, NS, az, alt, z, "zevenbergen_thorne")(p)
    azr, altr = np.radians(az), np.radians(alt)
    zf = z / 2.0
    for i, j in [(0, 0), (3, 7), (10, 10), (19, 19)]:
        w = _win(p, i, j)
        x = (w[3] - w[5]) / EW
        y = (w[7] - w[1]) / NS
        num = np.sin(altr) - (y * np.cos(azr) * np.cos(altr) * zf - x * np.sin(azr) * np.cos(altr) * zf)
        cang = 254.0 * num / np.sqrt(1.0 + zf * zf * (x * x + y * y))
        exp = 1.0 if cang <= 0 else 1.0 + cang
        assert k[i, j] == pytest.approx(exp, abs=1e-9)


@pytest.mark.parametrize("variant", ["regular", "combined", "multidirectional", "igor"])
def test_zt_distributed_matches_local(spark, variant):
    t = byte20_tiles(spark)
    out = hillshade(t, FSPEC, variant=variant, z=2.0, alg="zevenbergen_thorne")
    got = materialize_full(out, FSPEC)
    from gdal_spark.operators.focal import (
        hillshade_combined_kernel,
        hillshade_igor_kernel,
        hillshade_multidirectional_kernel,
    )

    if variant == "regular":
        kern = hillshade_gradient_kernel(EW, NS, 315.0, 45.0, 2.0, "zevenbergen_thorne")
    elif variant == "combined":
        kern = hillshade_combined_kernel(EW, NS, 315.0, 45.0, 2.0, "zevenbergen_thorne")
    elif variant == "multidirectional":
        kern = hillshade_multidirectional_kernel(EW, NS, 45.0, 2.0, "zevenbergen_thorne")
    else:
        kern = hillshade_igor_kernel(EW, NS, 315.0, 45.0, 2.0, "zevenbergen_thorne")
    exp = focal_apply_local(BYTE20.astype(np.float64), kern)
    np.testing.assert_allclose(got, exp, rtol=0, atol=1e-12)


def test_zt_slope_aspect_distributed(spark):
    t = byte20_tiles(spark)
    s = materialize_full(slope(t, FSPEC, alg="zevenbergen_thorne"), FSPEC)
    a = materialize_full(aspect(t, FSPEC, alg="zevenbergen_thorne"), FSPEC)
    exp_s = focal_apply_local(BYTE20.astype(np.float64), zt_slope_kernel(abs(EW), abs(NS)))
    exp_a = focal_apply_local(BYTE20.astype(np.float64), zt_aspect_kernel())
    np.testing.assert_allclose(s, exp_s, rtol=0, atol=1e-12)
    np.testing.assert_allclose(a, exp_a, rtol=0, atol=1e-12)
    # and ZT differs from Horn somewhere (not a silent alias)
    horn = materialize_full(slope(t, FSPEC), FSPEC)
    assert (np.abs(horn - s) > 1e-9).any()
