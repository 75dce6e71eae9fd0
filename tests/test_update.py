"""gdal raster update (gdalalg_raster_update.cpp) via GridTMS —
warp-into-existing over the dst raster's own grid."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.geom.proj import Pipeline
from gdal_spark.operators.raster import RasterSpec, materialize_full
from gdal_spark.operators.update import GridTMS, raster_update


def _src(spark, arr, spec):
    return spark.createDataFrame(
        [(1, 0, 0, arr.shape[0], arr.shape[1], str(arr.dtype), bytes(arr.tobytes()))],
        "band int, ty int, tx int, h int, w int, dtype string, payload binary",
    )


class TestGridTMS:
    def test_surface(self):
        tms = GridTMS(BYTE20_SPEC)
        assert tms.resolution(0) == 60.0
        assert tms.top_left == (BYTE20_SPEC.gt[0], BYTE20_SPEC.gt[3])
        ox, oy = tms.tile_origin(0, 1, 1)
        assert ox == BYTE20_SPEC.gt[0] + 16 * 60.0
        assert oy == BYTE20_SPEC.gt[3] - 16 * 60.0

    def test_rejects_rotation(self):
        import pytest

        spec = RasterSpec(width=4, height=4, gt=(0, 1, 0.1, 0, 0, -1),
                          dtype="uint8", nbands=1, tile_size=4)
        with pytest.raises(ValueError):
            GridTMS(spec)


class TestUpdate:
    def test_aligned_patch_bit_exact(self, spark):
        gt = BYTE20_SPEC.gt
        sgt = (gt[0] + 5 * gt[1], gt[1], 0.0, gt[3] + 5 * gt[5], 0.0, gt[5])
        src_spec = RasterSpec(width=10, height=10, gt=sgt, dtype="uint8",
                              nbands=1, tile_size=16)
        arr = np.arange(100, dtype=np.uint8).reshape(10, 10)
        out = raster_update(
            byte20_tiles(spark), BYTE20_SPEC, _src(spark, arr, src_spec),
            src_spec, Pipeline(),
        )
        got = materialize_full(out, BYTE20_SPEC)
        want = BYTE20.copy()
        want[5:15, 5:15] = arr
        np.testing.assert_array_equal(got, want)

    def test_offgrid_source_outside_is_untouched(self, spark):
        # source entirely outside the dst extent: dst returned verbatim
        gt = BYTE20_SPEC.gt
        sgt = (gt[0] + 1000 * gt[1], gt[1], 0.0, gt[3] + 1000 * gt[5], 0.0, gt[5])
        src_spec = RasterSpec(width=4, height=4, gt=sgt, dtype="uint8",
                              nbands=1, tile_size=16)
        arr = np.full((4, 4), 9, np.uint8)
        out = raster_update(
            byte20_tiles(spark), BYTE20_SPEC, _src(spark, arr, src_spec),
            src_spec, Pipeline(),
        )
        np.testing.assert_array_equal(materialize_full(out, BYTE20_SPEC), BYTE20)


class TestReviewRegressions:
    def test_band_count_mismatch_raises(self, spark):
        import pytest

        src_spec = RasterSpec(width=4, height=4, gt=BYTE20_SPEC.gt,
                              dtype="uint8", nbands=2, tile_size=16)
        with pytest.raises(ValueError, match="band counts"):
            raster_update(
                byte20_tiles(spark), BYTE20_SPEC,
                _src(spark, np.zeros((4, 4), np.uint8), src_spec),
                src_spec, Pipeline(),
            )

    def test_update_onto_absent_sparse_tile(self, spark):
        """A warped update landing on a dst tile absent from the sparse
        table must composite over an init canvas, not vanish (absent
        tile == init-valued, the repo-wide tile-table convention)."""
        gt = BYTE20_SPEC.gt
        # dst missing tile (ty=0, tx=0); update patch entirely inside it
        dst = byte20_tiles(spark).filter(~((F.col("ty") == 0) & (F.col("tx") == 0)))
        sgt = (gt[0] + 2 * gt[1], gt[1], 0.0, gt[3] + 2 * gt[5], 0.0, gt[5])
        src_spec = RasterSpec(width=4, height=4, gt=sgt, dtype="uint8",
                              nbands=1, tile_size=16)
        arr = np.full((4, 4), 200, dtype=np.uint8)
        out = raster_update(dst, BYTE20_SPEC, _src(spark, arr, src_spec),
                            src_spec, Pipeline())
        full = materialize_full(out, BYTE20_SPEC)
        want = BYTE20.copy().astype(np.uint8)
        ts = BYTE20_SPEC.tile_size
        want[:ts, :ts] = BYTE20_SPEC.init or 0  # the absent tile's base
        want[2:6, 2:6] = 200
        assert np.array_equal(full, want)
