"""pct2rgb color-table expansion (osgeo_utils/pct2rgb.py parity)."""

from __future__ import annotations

import numpy as np

from gdal_spark.operators.dither import pct2rgb
from gdal_spark.operators.raster import RasterSpec


def _tiles(spark, arr, ts):
    spec = RasterSpec(width=arr.shape[1], height=arr.shape[0],
                      gt=(0, 1, 0, float(arr.shape[0]), 0, -1),
                      dtype="uint8", tile_size=ts)
    rows = []
    for ty in range(spec.ntiles_y):
        for tx in range(spec.ntiles_x):
            h, w = spec.tile_shape(ty, tx)
            rows.append((1, ty, tx, h, w, "uint8",
                         arr[ty * ts : ty * ts + h, tx * ts : tx * ts + w].tobytes()))
    return spark.createDataFrame(
        rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary"
    ), spec


def _mat(tiles, spec, nb):
    out = np.zeros((nb, spec.height, spec.width), dtype=np.uint8)
    ts = spec.tile_size
    for r in tiles.collect():
        t = np.frombuffer(r.payload, dtype=np.uint8).reshape(r.h, r.w)
        out[r.band - 1, r.ty * ts : r.ty * ts + r.h, r.tx * ts : r.tx * ts + r.w] = t
    return out


class TestPct2Rgb:
    def test_table_and_identity_default(self, spark):
        rng = np.random.default_rng(2)
        idx = rng.integers(0, 6, size=(9, 11), dtype=np.uint8)
        idx[0, 0] = 200  # beyond the table -> identity ramp + alpha 255
        table = [(10, 20, 30), (1, 2, 3), (250, 0, 128), (0, 0, 0), (9, 9, 9), (77, 66, 55)]
        tiles, spec = _tiles(spark, idx, 4)
        got = _mat(pct2rgb(tiles, spec, table, out_bands=4), spec, 4)
        lut = [np.arange(256), np.arange(256), np.arange(256), np.full(256, 255)]
        for i, e in enumerate(table):
            for c in range(3):
                lut[c][i] = e[c]
        for b in range(3):
            np.testing.assert_array_equal(got[b], np.take(lut[b], idx).astype(np.uint8))
        np.testing.assert_array_equal(got[3], np.take(lut[3], idx).astype(np.uint8))
        assert got[0][0, 0] == 200 and got[3][0, 0] == 255

    def test_rgba_entries(self, spark):
        idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
        table = [(5, 6, 7, 128), (8, 9, 10, 0)]
        tiles, spec = _tiles(spark, idx, 2)
        got = _mat(pct2rgb(tiles, spec, table, out_bands=4), spec, 4)
        assert got[3][0, 0] == 128 and got[3][0, 1] == 0
