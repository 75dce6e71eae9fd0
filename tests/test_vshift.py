"""GDALApplyVerticalShiftGrid tests."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators.raster import RasterSpec
from gdal_spark.operators.vshift import apply_vertical_shift_grid


def _tiles(spark, arr, spec):
    ts = spec.tile_size
    rows = []
    for ty in range(spec.ntiles_y):
        for tx in range(spec.ntiles_x):
            h, w = spec.tile_shape(ty, tx)
            rows.append((1, ty, tx, h, w, str(arr.dtype),
                         arr[ty * ts : ty * ts + h, tx * ts : tx * ts + w].tobytes()))
    return spark.createDataFrame(
        rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary"
    )


def _mat(tiles, spec):
    out = np.full((spec.height, spec.width), np.nan)
    ts = spec.tile_size
    for r in tiles.collect():
        t = np.frombuffer(r.payload, dtype=r.dtype).reshape(r.h, r.w)
        out[r.ty * ts : r.ty * ts + r.h, r.tx * ts : r.tx * ts + r.w] = t
    return out


def _bilinear_ref(grid, sx, sy):
    """Independent GWKBilinearResample4Sample replica."""
    gh, gw = grid.shape
    out = np.zeros(sx.shape)
    for i in np.ndindex(sx.shape):
        x, y = sx[i], sy[i]
        ix = int(np.floor(x - 0.5))
        iy = int(np.floor(y - 0.5))
        rx = 1.5 - (x - ix)
        ry = 1.5 - (y - iy)
        if ix == -1:
            ix, rx = 0, 1.0
        if iy == -1:
            iy, ry = 0, 1.0
        acc = div = 0.0
        for dy, wy in ((0, ry), (1, 1.0 - ry)):
            for dx, wx in ((0, rx), (1, 1.0 - rx)):
                cx, cy = ix + dx, iy + dy
                if 0 <= cx < gw and 0 <= cy < gh:
                    w = wx * wy
                    acc += grid[cy, cx] * w
                    div += w
        out[i] = acc / div
    return out


class TestVShift:
    def test_identity_grid_adds_exactly(self, spark):
        spec = RasterSpec(width=12, height=10, gt=(0.0, 1.0, 0.0, 10.0, 0.0, -1.0),
                          dtype="float64", tile_size=4)
        rng = np.random.default_rng(1)
        dem = rng.integers(0, 500, (10, 12)).astype(np.float64)
        shift = rng.integers(-40, 40, (10, 12)).astype(np.float64)
        out = apply_vertical_shift_grid(
            _tiles(spark, dem, spec), spec, _tiles(spark, shift, spec), spec
        )
        np.testing.assert_array_equal(_mat(out, spec), dem + shift)

    def test_coarse_grid_bilinear_units_inverse(self, spark):
        spec = RasterSpec(width=16, height=16, gt=(0.0, 1.0, 0.0, 16.0, 0.0, -1.0),
                          dtype="float64", tile_size=5)
        gspec = RasterSpec(width=4, height=4, gt=(0.0, 4.0, 0.0, 16.0, 0.0, -4.0),
                           dtype="float64", tile_size=4)
        rng = np.random.default_rng(2)
        dem = rng.normal(100, 20, (16, 16))
        grid = rng.normal(0, 5, (4, 4))
        got = _mat(apply_vertical_shift_grid(
            _tiles(spark, dem, spec), spec, _tiles(spark, grid, gspec), gspec,
            inverse=True, src_unit_to_meter=0.3048, dst_unit_to_meter=2.0,
        ), spec)
        py, px = np.mgrid[0:16, 0:16]
        sx = (px + 0.5) / 4.0
        sy = (py + 0.5) / 4.0
        gv = _bilinear_ref(grid, sx, sy)
        want = (dem * 0.3048 - gv) / 2.0
        np.testing.assert_allclose(got, want, rtol=0, atol=0)

    def test_nodata_passthrough(self, spark):
        spec = RasterSpec(width=6, height=6, gt=(0.0, 1.0, 0.0, 6.0, 0.0, -1.0),
                          dtype="float64", tile_size=6)
        dem = np.full((6, 6), -9999.0)
        dem[2, 2] = 10.0
        shift = np.full((6, 6), 3.0)
        got = _mat(apply_vertical_shift_grid(
            _tiles(spark, dem, spec), spec, _tiles(spark, shift, spec), spec,
            src_nodata=-9999.0,
        ), spec)
        assert got[0, 0] == -9999.0 and got[2, 2] == 13.0

    def test_missing_grid_coverage_raises(self, spark):
        spec = RasterSpec(width=8, height=8, gt=(0.0, 1.0, 0.0, 8.0, 0.0, -1.0),
                          dtype="float64", tile_size=8)
        # grid covers only the left half -> right-half centers invalid
        gspec = RasterSpec(width=1, height=2, gt=(0.0, 4.0, 0.0, 8.0, 0.0, -4.0),
                           dtype="float64", tile_size=2)
        dem = np.ones((8, 8))
        grid = np.ones((2, 1))
        with pytest.raises(Exception, match="Missing vertical grid value"):
            _mat(apply_vertical_shift_grid(
                _tiles(spark, dem, spec), spec, _tiles(spark, grid, gspec), gspec
            ), spec)
