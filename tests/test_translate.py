"""gdal_translate operator tests: subwindow crop, nearest/average
resize with the exact overview index rules, scale+cast."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.raster import copy_word
from gdal_spark.operators.translate import _near_map, translate


def _materialize(tiles, spec):
    arr = np.zeros((spec.height, spec.width), dtype=spec.dtype)
    for r in tiles.collect():
        t = np.frombuffer(r.payload, dtype=r.dtype).reshape(r.h, r.w)
        arr[r.ty * spec.tile_size : r.ty * spec.tile_size + r.h,
            r.tx * spec.tile_size : r.tx * spec.tile_size + r.w] = t
    return arr


def _near_ref(win: np.ndarray, outh: int, outw: int) -> np.ndarray:
    ry, rx = win.shape[0] / outh, win.shape[1] / outw
    yi = np.minimum((0.5 + np.arange(outh) * ry).astype(int), win.shape[0] - 1)
    xi = np.minimum((0.5 + np.arange(outw) * rx).astype(int), win.shape[1] - 1)
    return win[yi][:, xi]


class TestTranslate:
    def test_identity(self, spark):
        out, dspec = translate(byte20_tiles(spark), BYTE20_SPEC)
        np.testing.assert_array_equal(_materialize(out, dspec), BYTE20)

    def test_srcwin_crop(self, spark):
        out, dspec = translate(byte20_tiles(spark), BYTE20_SPEC, srcwin=(3, 2, 10, 12))
        np.testing.assert_array_equal(_materialize(out, dspec), BYTE20[2:14, 3:13])
        assert dspec.gt[0] == 440720 + 3 * 60 and dspec.gt[3] == 3751320 - 2 * 60

    def test_outsize_near_downsample(self, spark):
        out, dspec = translate(byte20_tiles(spark), BYTE20_SPEC, outsize=(10, 10))
        np.testing.assert_array_equal(_materialize(out, dspec), _near_ref(BYTE20, 10, 10))

    def test_outsize_near_upsample(self, spark):
        out, dspec = translate(byte20_tiles(spark), BYTE20_SPEC, srcwin=(0, 0, 5, 5), outsize=(12, 12))
        np.testing.assert_array_equal(_materialize(out, dspec), _near_ref(BYTE20[:5, :5], 12, 12))

    def test_outsize_average(self, spark):
        out, dspec = translate(byte20_tiles(spark), BYTE20_SPEC, outsize=(10, 10), resampling="average")
        got = _materialize(out, dspec)
        # reference: integer (sum + n/2) / n over each 2x2 block
        b = BYTE20.astype(np.int64)
        want = (b[0::2, 0::2] + b[1::2, 0::2] + b[0::2, 1::2] + b[1::2, 1::2] + 2) // 4
        np.testing.assert_array_equal(got, want.astype(np.uint8))

    def test_scale_and_cast(self, spark):
        out, dspec = translate(
            byte20_tiles(spark), BYTE20_SPEC, scale=(0.5, 10.0), out_dtype="int16"
        )
        got = _materialize(out, dspec)
        want = copy_word(BYTE20.astype(np.float64) * 0.5 + 10.0, "int16")
        np.testing.assert_array_equal(got, want)

    def test_near_map_rule(self):
        # overview.cpp:126 int(0.5 + i*ratio)
        np.testing.assert_array_equal(_near_map(np.arange(5), 2.0, 0, 10), [0, 2, 4, 6, 8])
        np.testing.assert_array_equal(_near_map(np.arange(4), 0.5, 0, 2), [0, 1, 1, 1])

    def test_dst_tiling_seams(self, spark):
        # force multi-tile dst (tile 8) and check seam correctness
        out, dspec = translate(byte20_tiles(spark), BYTE20_SPEC, dst_tile_size=8)
        np.testing.assert_array_equal(_materialize(out, dspec), BYTE20)


class TestColorRelief:
    """gdaldem color-relief (GDALColorReliefGetRGBA) vs a scalar
    replica of the reference's bisection + clamp + lerp rules."""

    RAMP = [(0, 0, 0, 255), (100, 0, 255, 0, 200), (200, 255, 0, 0)]

    def _ref(self, v, mode):
        vals = [e[0] for e in self.RAMP]
        cols = [(e[1], e[2], e[3], e[4] if len(e) > 4 else 255) for e in self.RAMP]
        import bisect

        i = bisect.bisect_left(vals, v)
        if i == 0:
            return (0, 0, 0, 0) if (mode == "exact" and vals[0] != v) else cols[0]
        if i == len(vals):
            return (0, 0, 0, 0) if (mode == "exact" and vals[-1] != v) else cols[-1]
        if vals[i - 1] == v:
            return cols[i - 1]
        if vals[i] == v:
            return cols[i]
        if mode == "exact":
            return (0, 0, 0, 0)
        if mode == "nearest":
            idx = i - 1 if (v - vals[i - 1]) < (vals[i] - v) else i
            return cols[idx]
        t = (v - vals[i - 1]) / (vals[i] - vals[i - 1])
        return tuple(
            max(0, min(255, int(0.5 + cols[i - 1][c] + t * (cols[i][c] - cols[i - 1][c]))))
            for c in range(4)
        )

    @pytest.mark.parametrize("mode", ["interpolate", "nearest", "exact"])
    def test_matches_reference_rule(self, spark, mode):
        import pandas as pd

        from gdal_spark.operators.raster import RasterSpec
        from gdal_spark.operators.translate import color_relief

        vals = np.array([[0, 50, 100, 150], [200, 250, 17, 99]], dtype=np.float64)
        spec = RasterSpec(width=4, height=2, gt=(0, 1, 0, 2, 0, -1), dtype="float64", tile_size=4)
        df = spark.createDataFrame(
            pd.DataFrame(
                [{"band": 1, "ty": 0, "tx": 0, "h": 2, "w": 4,
                  "dtype": "float64", "payload": vals.tobytes()}]
            )
        )
        out = {r.band: np.frombuffer(r.payload, dtype=r.dtype).reshape(2, 4)
               for r in color_relief(df, spec, self.RAMP, mode=mode).collect()}
        assert set(out) == {1, 2, 3, 4}
        for y in range(2):
            for x in range(4):
                want = self._ref(vals[y, x], mode)
                got = tuple(int(out[c + 1][y, x]) for c in range(4))
                assert got == want, (mode, vals[y, x], got, want)
