"""gdal raster pixel-info (apps/gdalalg_raster_pixel_info.cpp):
fractional column/line, floor cell, per-band sampled value with
scale/offset, NULL for off-raster points."""

from __future__ import annotations

import numpy as np

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.grid import pixel_info

GT = BYTE20_SPEC.gt


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, x double, y double")


class TestPixelInfo:
    def test_nearest_values_and_cells(self, spark):
        # pixel centers of (line, pixel) = (3, 4) and (17, 0), plus a
        # fractional interior position and one point off the raster
        rows = [
            (0, GT[0] + 4.5 * GT[1], GT[3] + 3.5 * GT[5]),
            (1, GT[0] + 0.5 * GT[1], GT[3] + 17.5 * GT[5]),
            (2, GT[0] + 7.25 * GT[1], GT[3] + 9.75 * GT[5]),
            (3, GT[0] - 5.0 * GT[1], GT[3] + 3.5 * GT[5]),
        ]
        out = {
            r["pid"]: r
            for r in pixel_info(
                byte20_tiles(spark), BYTE20_SPEC, _pts(spark, rows)
            ).collect()
        }
        assert out[0]["pixel"] == 4 and out[0]["line_cell"] == 3
        assert out[0]["raw_value"] == float(BYTE20[3, 4])
        assert out[1]["raw_value"] == float(BYTE20[17, 0])
        assert out[2]["pixel"] == 7 and out[2]["line_cell"] == 9
        assert out[2]["raw_value"] == float(BYTE20[9, 7])
        assert out[2]["column"] == 7.25 and out[2]["line"] == 9.75
        # off-raster: coordinates survive, value NULL (:860+ sample failure)
        assert out[3]["pixel"] == -5 and out[3]["raw_value"] is None

    def test_scale_offset(self, spark):
        rows = [(0, GT[0] + 2.5 * GT[1], GT[3] + 2.5 * GT[5])]
        r = pixel_info(
            byte20_tiles(spark), BYTE20_SPEC, _pts(spark, rows),
            scales={1: 0.5}, offsets={1: 10.0},
        ).collect()[0]
        assert r["unscaled_value"] == float(BYTE20[2, 2]) * 0.5 + 10.0

    def test_bilinear_matches_numpy(self, spark):
        # interior point, 2x2 window fully inside one tile
        rows = [(0, GT[0] + 5.0 * GT[1], GT[3] + 5.0 * GT[5])]
        r = pixel_info(
            byte20_tiles(spark), BYTE20_SPEC, _pts(spark, rows),
            interpolation="bilinear",
        ).collect()[0]
        w = BYTE20[4:6, 4:6].astype(np.float64)
        want = w.mean()  # sample position exactly between the 4 centers
        assert r["raw_value"] == want
