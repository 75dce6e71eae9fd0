"""gdal_rasterize -i: distributed complement burn vs local coverage."""

from __future__ import annotations

import numpy as np

from gdal_spark.operators.raster import RasterSpec, rasterize_invert, rasterize_local


def _mat(tiles, spec, band=1):
    out = np.full((spec.height, spec.width), np.nan)
    ts = spec.tile_size
    for r in tiles.collect():
        if r.band != band:
            continue
        t = np.frombuffer(r.payload, dtype=r.dtype).reshape(r.h, r.w)
        out[r.ty * ts : r.ty * ts + r.h, r.tx * ts : r.tx * ts + r.w] = t
    assert not np.isnan(out).any()  # invert output must be dense
    return out


WKTS = [
    "POLYGON ((2 2, 2 9, 8 9, 8 2, 2 2))",
    "POLYGON ((10 1, 10 6, 15 6, 15 1, 10 1))",
    "MULTIPOLYGON (((0 12, 0 16, 4 16, 4 12, 0 12)))",
    "LINESTRING (0 0, 17 17)",  # ignored in -i mode
    "POINT (5 15)",             # ignored in -i mode
]


class TestRasterizeInvert:
    def test_complement_of_coverage(self, spark):
        spec = RasterSpec(width=18, height=17, gt=(0.0, 1.0, 0.0, 17.0, 0.0, -1.0),
                          dtype="uint8", nbands=1, init=0.0, tile_size=5)
        shapes = spark.createDataFrame([(i, w) for i, w in enumerate(WKTS)], "fid int, wkt string")
        got = _mat(rasterize_invert(shapes, spec, [9.0]), spec)
        polys = [w for w in WKTS if w.startswith(("POLYGON", "MULTIPOLYGON"))]
        cover = rasterize_local(polys, [[1.0]] * len(polys), spec)[0]
        want = np.where(cover != 0, 0, 9).astype(np.uint8)
        np.testing.assert_array_equal(got, want)
        assert (got == 9).any() and (got == 0).any()

    def test_multiband_burn_values(self, spark):
        spec = RasterSpec(width=8, height=8, gt=(0.0, 1.0, 0.0, 8.0, 0.0, -1.0),
                          dtype="uint8", nbands=2, init=1.0, tile_size=8)
        shapes = spark.createDataFrame(
            [(0, "POLYGON ((1 1, 1 5, 5 5, 5 1, 1 1))")], "fid int, wkt string"
        )
        out = rasterize_invert(shapes, spec, [3.0, 4.0])
        m1 = _mat(out, spec, band=1)
        m2 = _mat(out, spec, band=2)
        mask_spec = RasterSpec(width=8, height=8, gt=spec.gt, dtype="uint8",
                               nbands=1, init=0.0, tile_size=8)
        cover = rasterize_local([shapes.collect()[0].wkt], [[1.0]], mask_spec)[0]
        np.testing.assert_array_equal(m1, np.where(cover != 0, 1, 3))
        np.testing.assert_array_equal(m2, np.where(cover != 0, 1, 4))

    def test_no_polygons_burns_everything(self, spark):
        spec = RasterSpec(width=4, height=4, gt=(0.0, 1.0, 0.0, 4.0, 0.0, -1.0),
                          dtype="uint8", nbands=1, init=0.0, tile_size=4)
        shapes = spark.createDataFrame([(0, "POINT (1 1)")], "fid int, wkt string")
        got = _mat(rasterize_invert(shapes, spec, [5.0]), spec)
        assert (got == 5).all()
