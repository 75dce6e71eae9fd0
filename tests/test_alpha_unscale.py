"""nodata-to-alpha + unscale (gdalalg_raster_nodata_to_alpha.cpp /
gdalalg_raster_unscale.cpp)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.raster import RasterSpec, materialize_full
from gdal_spark.operators.translate import nodata_to_alpha, unscale


class TestNodataToAlpha:
    def test_single_band(self, spark):
        out = nodata_to_alpha(byte20_tiles(spark), BYTE20_SPEC, nodata=107.0)
        spec2 = RasterSpec(**{**BYTE20_SPEC.__dict__, "nbands": 2})
        alpha = materialize_full(out.filter(F.col("band") == 2), spec2, band=2)
        np.testing.assert_array_equal(alpha, np.where(BYTE20 == 107, 0, 255))
        # data band passes through untouched
        data = materialize_full(out.filter(F.col("band") == 1), BYTE20_SPEC)
        np.testing.assert_array_equal(data, BYTE20)

    def test_multiband_all_rule(self, spark):
        # per-dataset NODATA_VALUES mask: transparent ONLY where every
        # band matches its own nodata
        a = np.array([[1, 2], [3, 1]], dtype=np.uint8)
        b = np.array([[9, 9], [8, 9]], dtype=np.uint8)
        spec = RasterSpec(width=2, height=2, gt=(0, 1, 0, 0, 0, -1),
                          dtype="uint8", nbands=2, tile_size=2)
        rows = [(1, 0, 0, 2, 2, "uint8", bytes(a.tobytes())),
                (2, 0, 0, 2, 2, "uint8", bytes(b.tobytes()))]
        tiles = spark.createDataFrame(
            rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary")
        out = nodata_to_alpha(tiles, spec, nodata=[1.0, 9.0])
        r = out.filter(F.col("band") == 3).first()
        alpha = np.frombuffer(r["payload"], dtype="uint8").reshape(2, 2)
        np.testing.assert_array_equal(alpha, [[0, 255], [255, 0]])


class TestUnscale:
    def test_scale_offset(self, spark):
        out, dspec = unscale(byte20_tiles(spark), BYTE20_SPEC, 0.5, 3.25)
        got = materialize_full(out, dspec)
        want = (BYTE20.astype(np.float64) * 0.5 + 3.25).astype(np.float32)
        np.testing.assert_array_equal(got, want)
        assert dspec.dtype == "float32"
