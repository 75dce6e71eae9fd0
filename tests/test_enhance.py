"""gdalenhance equalization: distributed LUT build/apply vs a literal
scalar replica of ComputeEqualizationLUTs + EnhancerCallback."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.enhance import equalization_luts, equalize
from gdal_spark.operators.raster import RasterSpec


def _scalar_lut(arr: np.ndarray, lut_bins=256):
    """Byte band -> (scale_min, scale_max, lut) per gdalenhance.cpp."""
    hist, _ = np.histogram(arr, bins=256, range=(-0.5, 255.5))
    hist = hist.astype(np.int64)
    hist[0] = 0
    hist[-1] = 0
    total = 0
    cum = np.zeros(256, dtype=np.int64)
    for i in range(256):
        cum[i] = total + hist[i] // 2
        total += hist[i]
    if total == 0:
        total = 1
    lut = np.zeros(lut_bins, dtype=np.int64)
    for i in range(lut_bins):
        ih = (i * 256) // lut_bins
        lut[i] = max(0, min(lut_bins - 1, (cum[ih] * lut_bins) // total))
    return -0.5, 255.5, lut


def _scalar_apply(arr, dfmin, dfmax, lut, lut_bins=256, nodata=None):
    out = np.zeros(arr.shape, dtype=np.uint8)
    scale = lut_bins / (dfmax - dfmin)
    for i in np.ndindex(arr.shape):
        v = np.float32(arr[i])
        if nodata is not None and v == np.float32(nodata):
            out[i] = np.uint8(int(nodata) & 0xFF)
            continue
        dfbin = (float(v) - dfmin) * scale
        if not dfbin > 0:
            ib = 0
        elif not dfbin < lut_bins - 1:
            ib = lut_bins - 1
        else:
            ib = int(dfbin)
        out[i] = np.uint8(lut[ib])
    return out


def _tiles(spark, arr3, spec):
    ts = spec.tile_size
    rows = []
    for b in range(arr3.shape[0]):
        for ty in range(spec.ntiles_y):
            for tx in range(spec.ntiles_x):
                h, w = spec.tile_shape(ty, tx)
                rows.append((b + 1, ty, tx, h, w, str(arr3.dtype),
                             arr3[b, ty * ts : ty * ts + h, tx * ts : tx * ts + w].tobytes()))
    return spark.createDataFrame(
        rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary"
    )


def _mat(tiles, spec, nbands):
    out = np.zeros((nbands, spec.height, spec.width), dtype=np.uint8)
    ts = spec.tile_size
    for r in tiles.collect():
        t = np.frombuffer(r.payload, dtype=np.uint8).reshape(r.h, r.w)
        out[r.band - 1, r.ty * ts : r.ty * ts + r.h, r.tx * ts : r.tx * ts + r.w] = t
    return out


class TestEqualize:
    def test_byte20_lut_matches_scalar(self, spark):
        dfmin, dfmax, want = _scalar_lut(BYTE20)
        got = equalization_luts(byte20_tiles(spark), BYTE20_SPEC)
        assert got[1][0] == dfmin and got[1][1] == dfmax
        np.testing.assert_array_equal(got[1][2], want)

    def test_byte20_equalized_matches_scalar(self, spark):
        dfmin, dfmax, lut = _scalar_lut(BYTE20)
        want = _scalar_apply(BYTE20, dfmin, dfmax, lut)
        got = equalize(byte20_tiles(spark), BYTE20_SPEC)
        np.testing.assert_array_equal(_mat(got, BYTE20_SPEC, 1)[0], want)

    def test_random_multiband(self, spark):
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, size=(2, 19, 23), dtype=np.uint8)
        spec = RasterSpec(width=23, height=19, gt=(0, 1, 0, 19, 0, -1),
                          dtype="uint8", nbands=2, tile_size=7)
        got = _mat(equalize(_tiles(spark, arr, spec), spec), spec, 2)
        for b in range(2):
            dfmin, dfmax, lut = _scalar_lut(arr[b])
            want = _scalar_apply(arr[b], dfmin, dfmax, lut)
            np.testing.assert_array_equal(got[b], want)

    def test_nodata_passthrough(self, spark):
        arr = BYTE20.copy()[None, ...]
        spec = BYTE20_SPEC
        got = _mat(equalize(byte20_tiles(spark), spec, nodata=107.0), spec, 1)[0]
        # nodata pixels keep the raw value
        assert (got[BYTE20 == 107] == 107).all()
        # and are excluded from the histogram -> LUT differs from the
        # no-nodata LUT
        plain = _mat(equalize(byte20_tiles(spark), spec), spec, 1)[0]
        assert not np.array_equal(got, plain)

    def test_float_input(self, spark):
        rng = np.random.default_rng(5)
        arr = (rng.random((1, 12, 14)) * 1000.0 - 200.0).astype(np.float64)
        spec = RasterSpec(width=14, height=12, gt=(0, 1, 0, 12, 0, -1),
                          dtype="float64", nbands=1, tile_size=8)
        luts = equalization_luts(_tiles(spark, arr, spec), spec)
        dfmin, dfmax, lut = luts[1]
        # replicate the non-byte default range (stats min/max + half bucket)
        mn, mx = float(arr.min()), float(arr.max())
        half = (mx - mn) / (2 * 255)
        assert abs(dfmin - (mn - half)) < 1e-9 and abs(dfmax - (mx + half)) < 1e-9
        got = _mat(equalize(_tiles(spark, arr, spec), spec, luts=luts), spec, 1)[0]
        want = _scalar_apply(arr[0], dfmin, dfmax, lut)
        np.testing.assert_array_equal(got, want)
