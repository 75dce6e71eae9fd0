"""Proximity (exact distributed EDT) tests vs brute force."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators.proximity import edt2, proximity
from gdal_spark.operators.raster import RasterSpec


def _brute(targets: np.ndarray) -> np.ndarray:
    ty, tx = np.nonzero(targets)
    h, w = targets.shape
    out = np.full((h, w), np.inf)
    for i in range(h):
        for j in range(w):
            if ty.size:
                out[i, j] = np.sqrt(((ty - i) ** 2 + (tx - j) ** 2).min())
    return out


def _tiles(spark, arr, tile_size):
    spec = RasterSpec(
        width=arr.shape[1], height=arr.shape[0],
        gt=(0.0, 1.0, 0.0, float(arr.shape[0]), 0.0, -1.0),
        dtype=str(arr.dtype), tile_size=tile_size,
    )
    rows = []
    for ty in range(spec.ntiles_y):
        for tx in range(spec.ntiles_x):
            h, w = spec.tile_shape(ty, tx)
            oy, ox = ty * tile_size, tx * tile_size
            rows.append((1, ty, tx, h, w, str(arr.dtype), arr[oy : oy + h, ox : ox + w].tobytes()))
    return (
        spark.createDataFrame(rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary"),
        spec,
    )


def _mat(tiles, spec):
    arr = np.zeros((spec.height, spec.width))
    for r in tiles.collect():
        t = np.frombuffer(r.payload, dtype=r.dtype).reshape(r.h, r.w)
        arr[r.ty * spec.tile_size : r.ty * spec.tile_size + r.h,
            r.tx * spec.tile_size : r.tx * spec.tile_size + r.w] = t
    return arr


class TestEDT:
    def test_edt2_matches_brute(self):
        rng = np.random.default_rng(9)
        m = (rng.random((17, 23)) < 0.05).astype(np.uint8)
        if not m.any():
            m[3, 4] = 1
        seed = np.where(m > 0, 0.0, 1e30)
        got = np.sqrt(edt2(seed))
        np.testing.assert_allclose(got, _brute(m), rtol=1e-12)


class TestProximityDistributed:
    def test_matches_brute_across_seams(self, spark):
        rng = np.random.default_rng(4)
        arr = (rng.random((20, 20)) < 0.03).astype(np.uint8)
        arr[2, 17] = 1  # ensure a target far from some tiles
        tiles, spec = _tiles(spark, arr, tile_size=8)
        got = _mat(proximity(tiles, spec), spec)
        np.testing.assert_allclose(got, _brute(arr), rtol=1e-12)

    def test_target_values_filter(self, spark):
        arr = np.zeros((8, 8), dtype=np.uint8)
        arr[1, 1] = 5
        arr[6, 6] = 7
        tiles, spec = _tiles(spark, arr, tile_size=4)
        got = _mat(proximity(tiles, spec, target_values=[7.0]), spec)
        want = _brute((arr == 7).astype(np.uint8))
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_maxdist_nodata(self, spark):
        arr = np.zeros((8, 8), dtype=np.uint8)
        arr[0, 0] = 1
        tiles, spec = _tiles(spark, arr, tile_size=4)
        got = _mat(proximity(tiles, spec, maxdist=3.0, nodata=-1.0), spec)
        assert got[0, 1] == 1.0 and got[7, 7] == -1.0

    def test_no_targets_all_nodata(self, spark):
        arr = np.zeros((8, 8), dtype=np.uint8)
        tiles, spec = _tiles(spark, arr, tile_size=4)
        got = _mat(proximity(tiles, spec, nodata=9999.0), spec)
        assert (got == 9999.0).all()
