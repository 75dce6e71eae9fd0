"""gdalcompare (osgeo_utils/gdalcompare.py) — identical rasters, known
pixel edits, and sparse-vs-dense tile tables."""

from __future__ import annotations

import numpy as np

from gdal_spark.fixtures import BYTE20, BYTE20_CHECKSUM, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.compare import raster_compare


def _edit_tile(spark, edit):
    rows = []
    spec = BYTE20_SPEC
    for ty in range(spec.ntiles_y):
        for tx in range(spec.ntiles_x):
            h, w = spec.tile_shape(ty, tx)
            oy, ox = ty * spec.tile_size, tx * spec.tile_size
            arr = BYTE20[oy : oy + h, ox : ox + w].copy()
            edit(ty, tx, arr)
            rows.append((1, ty, tx, h, w, "uint8", bytes(arr.tobytes())))
    return spark.createDataFrame(
        rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary"
    )


def test_identical_rasters(spark):
    r = raster_compare(byte20_tiles(spark), byte20_tiles(spark), BYTE20_SPEC).first()
    assert r["pixels_differing"] == 0
    assert r["max_diff"] == 0.0
    assert r["checksum_golden"] == r["checksum_new"] == BYTE20_CHECKSUM


def test_known_edits_counted(spark):
    def edit(ty, tx, arr):
        if ty == 0 and tx == 0:
            arr[2, 3] += 5
            arr[7, 1] -= 2
        if ty == 1 and tx == 1:
            arr[0, 0] = 0  # BYTE20[16, 16] == 99 -> diff 99

    r = raster_compare(byte20_tiles(spark), _edit_tile(spark, edit), BYTE20_SPEC).first()
    assert r["pixels_differing"] == 3
    assert r["max_diff"] == 99.0
    assert r["checksum_golden"] == BYTE20_CHECKSUM
    assert r["checksum_new"] != BYTE20_CHECKSUM


def test_missing_tile_compares_against_init(spark):
    sparse = byte20_tiles(spark).filter("NOT (ty = 1 AND tx = 0)")
    r = raster_compare(byte20_tiles(spark), sparse, BYTE20_SPEC).first()
    # tile (1, 0) is 4 rows x 16 cols, all nonzero in byte20
    block = BYTE20[16:20, 0:16]
    assert r["pixels_differing"] == int(np.count_nonzero(block))
    assert r["max_diff"] == float(block.max())
