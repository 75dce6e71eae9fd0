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
