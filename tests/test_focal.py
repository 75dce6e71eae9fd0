"""Focal/DEM operator tests: distributed halo exchange must equal the
single-array kernel on byte20 exactly (same numpy math, so bit-equal
across tile seams)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.focal import (
    focal_apply_local,
    focal_mean,
    focal_mean_kernel,
    hillshade,
    hillshade_kernel,
    horn_slope_kernel,
    slope,
)
from gdal_spark.operators.raster import RasterSpec


def _materialize(tiles, spec, dtype="float64"):
    arr = np.zeros((spec.height, spec.width), dtype=np.float64)
    for r in tiles.collect():
        t = np.frombuffer(r.payload, dtype=r.dtype).reshape(r.h, r.w)
        arr[r.ty * spec.tile_size : r.ty * spec.tile_size + r.h,
            r.tx * spec.tile_size : r.tx * spec.tile_size + r.w] = t
    return arr


class TestFocal:
    def test_slope_matches_local_bitexact(self, spark):
        tiles = byte20_tiles(spark)  # tile_size=16 -> 2x2 tiles, real seams
        got = _materialize(slope(tiles, BYTE20_SPEC), BYTE20_SPEC)
        want = focal_apply_local(BYTE20.astype(np.float64), horn_slope_kernel(60.0, 60.0))
        np.testing.assert_array_equal(got, want)

    def test_hillshade_matches_local(self, spark):
        tiles = byte20_tiles(spark)
        got = _materialize(hillshade(tiles, BYTE20_SPEC), BYTE20_SPEC)
        want = focal_apply_local(BYTE20.astype(np.float64), hillshade_kernel(60.0, 60.0))
        np.testing.assert_array_equal(got, want)
        assert got.min() >= 1 and got.max() <= 255

    def test_focal_mean_matches_local(self, spark):
        tiles = byte20_tiles(spark)
        got = _materialize(focal_mean(tiles, BYTE20_SPEC, size=3), BYTE20_SPEC)
        want = focal_apply_local(BYTE20.astype(np.float64), focal_mean_kernel(3))
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_interior_slope_value_handchecked(self, spark):
        # hand-compute Horn slope at (5,5) from the byte20 matrix
        p = BYTE20.astype(np.float64)
        a, b, c = p[4, 4], p[4, 5], p[4, 6]
        d, f = p[5, 4], p[5, 6]
        g, h, i = p[6, 4], p[6, 5], p[6, 6]
        dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8 * 60.0)
        dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8 * 60.0)
        want = np.degrees(np.arctan(np.hypot(dzdx, dzdy)))
        tiles = byte20_tiles(spark)
        got = _materialize(slope(tiles, BYTE20_SPEC), BYTE20_SPEC)[5, 5]
        assert got == pytest.approx(want, abs=1e-12)


class TestDemDerivatives:
    """aspect/TPI/TRI/roughness (gdaldem_lib.cpp formulas)."""

    def test_tpi_matches_local(self, spark):
        from gdal_spark.operators.focal import tpi, tpi_kernel

        got = _materialize(tpi(byte20_tiles(spark), BYTE20_SPEC), BYTE20_SPEC)
        want = focal_apply_local(BYTE20.astype(np.float64), tpi_kernel())
        np.testing.assert_array_equal(got, want)

    def test_tri_wilson_and_riley(self, spark):
        from gdal_spark.operators.focal import tri, tri_kernel

        for alg in ("Wilson", "Riley"):
            got = _materialize(tri(byte20_tiles(spark), BYTE20_SPEC, alg=alg), BYTE20_SPEC)
            want = focal_apply_local(BYTE20.astype(np.float64), tri_kernel(alg))
            np.testing.assert_array_equal(got, want)
        assert (focal_apply_local(BYTE20.astype(np.float64), tri_kernel("Riley")) >= 0).all()

    def test_roughness_matches_local(self, spark):
        from gdal_spark.operators.focal import roughness, roughness_kernel

        got = _materialize(roughness(byte20_tiles(spark), BYTE20_SPEC), BYTE20_SPEC)
        want = focal_apply_local(BYTE20.astype(np.float64), roughness_kernel())
        np.testing.assert_array_equal(got, want)
        assert (got >= 0).all()

    def test_aspect_handchecked(self, spark):
        from gdal_spark.operators.focal import aspect, aspect_kernel

        got = _materialize(aspect(byte20_tiles(spark), BYTE20_SPEC), BYTE20_SPEC)
        want = focal_apply_local(BYTE20.astype(np.float64), aspect_kernel())
        np.testing.assert_array_equal(got, want)
        real = got[(got != -9999.0)]
        assert ((real >= 0) & (real <= 360)).all()


class TestHillshadeVariants:
    """gdaldem hillshade -combined / -multidirectional / -igor
    (gdaldem_lib.cpp:1151,1256,946)."""

    def _flat(self):
        return np.full((6, 6), 100.0)

    def test_flat_terrain_values(self):
        from gdal_spark.operators.focal import (
            hillshade_combined_kernel,
            hillshade_igor_kernel,
            hillshade_multidirectional_kernel,
        )

        flat = self._flat()
        # combined: atan-slope ramp is 0 on flat ground -> full 255
        v = focal_apply_local(flat, hillshade_combined_kernel(5.0, -5.0))
        np.testing.assert_allclose(v, 255.0)
        # multidirectional flat cell: 1 + 254 * sin(alt) (the
        # xx_plus_yy == 0 early return, gdaldem_lib.cpp:1281)
        v = focal_apply_local(flat, hillshade_multidirectional_kernel(5.0, -5.0))
        np.testing.assert_allclose(v, 1.0 + 254.0 * np.sin(np.radians(45.0)))
        # igor: no slope -> no shadow -> 255
        v = focal_apply_local(flat, hillshade_igor_kernel(5.0, -5.0))
        np.testing.assert_allclose(v, 255.0)

    def test_sun_facing_slope_brighter(self):
        from gdal_spark.operators.focal import (
            hillshade_combined_kernel,
            hillshade_igor_kernel,
            hillshade_multidirectional_kernel,
        )

        ramp = np.add.outer(np.arange(8) * 2.0, np.arange(8) * 2.0)
        for mk in (
            hillshade_combined_kernel(1.0, -1.0),
            hillshade_multidirectional_kernel(1.0, -1.0),
            hillshade_igor_kernel(1.0, -1.0),
        ):
            lit = focal_apply_local(ramp, mk)[3, 3]     # ascends SE -> faces NW sun
            dark = focal_apply_local(-ramp, mk)[3, 3]   # ascends NW -> faces SE
            assert lit > dark

    def test_distributed_matches_local(self, spark):
        from gdal_spark.operators.focal import (
            hillshade_combined_kernel,
            hillshade_igor_kernel,
            hillshade_multidirectional_kernel,
        )

        tiles = byte20_tiles(spark)
        p = BYTE20.astype(np.float64)
        for variant, k in (
            ("combined", hillshade_combined_kernel(60.0, -60.0)),
            ("multidirectional", hillshade_multidirectional_kernel(60.0, -60.0)),
            ("igor", hillshade_igor_kernel(60.0, -60.0)),
        ):
            got = _materialize(hillshade(tiles, BYTE20_SPEC, variant=variant), BYTE20_SPEC)
            want = focal_apply_local(p, k)
            np.testing.assert_array_equal(got, want)
