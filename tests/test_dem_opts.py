"""gdaldem slope -p (percent) and aspect -zero_for_flat
(gdaldem_lib.cpp:1376-1407 slopeFormat, :3290,:3921 zero_for_flat)."""

from __future__ import annotations

import dataclasses

import numpy as np

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.focal import aspect, slope
from gdal_spark.operators.raster import materialize_full

FSPEC = dataclasses.replace(BYTE20_SPEC, dtype="float64")
EW, NS = abs(BYTE20_SPEC.gt[1]), abs(BYTE20_SPEC.gt[5])


def _pad():
    return np.pad(BYTE20.astype(np.float64), 1, mode="edge")


def test_slope_percent_horn(spark):
    got = materialize_full(slope(byte20_tiles(spark), FSPEC, percent=True), FSPEC)
    p = _pad()
    a, b, c = p[:-2, :-2], p[:-2, 1:-1], p[:-2, 2:]
    d, f = p[1:-1, :-2], p[1:-1, 2:]
    g, h, i = p[2:, :-2], p[2:, 1:-1], p[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8 * EW)
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8 * NS)
    exp = 100.0 * np.sqrt(dzdx * dzdx + dzdy * dzdy)
    np.testing.assert_allclose(got, exp, rtol=0, atol=1e-12)


def test_slope_percent_zt(spark):
    got = materialize_full(
        slope(byte20_tiles(spark), FSPEC, percent=True, alg="zevenbergen_thorne"), FSPEC)
    p = _pad()
    dx = (p[1:-1, :-2] - p[1:-1, 2:]) / EW
    dy = (p[2:, 1:-1] - p[:-2, 1:-1]) / NS
    # (100/2) * sqrt(key) (gdaldem_lib.cpp:1406)
    exp = 50.0 * np.sqrt(dx * dx + dy * dy)
    np.testing.assert_allclose(got, exp, rtol=0, atol=1e-12)


def _plateau_tiles(spark):
    """byte20 with a flat 6x6 plateau so the Horn gradient has true
    flat (dx==0 and dy==0) cells."""
    arr = BYTE20.copy()
    arr[4:10, 4:10] = 120
    rows = []
    sp = BYTE20_SPEC
    for ty in range(sp.ntiles_y):
        for tx in range(sp.ntiles_x):
            h, w = sp.tile_shape(ty, tx)
            oy, ox = ty * sp.tile_size, tx * sp.tile_size
            rows.append((1, ty, tx, h, w, "uint8",
                         bytes(arr[oy:oy + h, ox:ox + w].tobytes())))
    df = spark.createDataFrame(
        rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary")
    return df, arr


def test_aspect_zero_for_flat(spark):
    t, _ = _plateau_tiles(spark)
    nod = materialize_full(aspect(t, FSPEC), FSPEC)
    zer = materialize_full(aspect(t, FSPEC, zero_for_flat=True), FSPEC)
    flat = nod == -9999.0
    assert flat.any()  # the plateau interior is flat
    assert (zer[flat] == 0.0).all()
    np.testing.assert_allclose(zer[~flat], nod[~flat], rtol=0, atol=0)
    # ZT variant honors it too
    zt = materialize_full(aspect(t, FSPEC, alg="zevenbergen_thorne", zero_for_flat=True), FSPEC)
    assert not (zt == -9999.0).any()
