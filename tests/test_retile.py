"""gdal_retile (osgeo_utils/gdal_retile.py) — pixel-identical
re-gridding of tile tables, both directions, with sparse inputs."""

from __future__ import annotations

import numpy as np

from gdal_spark.fixtures import BYTE20, BYTE20_CHECKSUM, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.raster import checksum_df, materialize_full
from gdal_spark.operators.retile import retile, retile_spec


def test_retile_down_is_pixel_identical(spark):
    t7 = retile(byte20_tiles(spark), BYTE20_SPEC, 7)
    s7 = retile_spec(BYTE20_SPEC, 7)
    assert np.array_equal(materialize_full(t7, s7), BYTE20)
    assert checksum_df(t7, s7) == BYTE20_CHECKSUM
    # 20/7 -> 3x3 tile grid with ragged last row/col
    rows = t7.collect()
    assert len(rows) == 9
    shapes = {(r["ty"], r["tx"]): (r["h"], r["w"]) for r in rows}
    assert shapes[(2, 2)] == (6, 6)
    assert shapes[(0, 2)] == (7, 6)


def test_retile_up_merges_tiles(spark):
    t32 = retile(byte20_tiles(spark), BYTE20_SPEC, 32)
    s32 = retile_spec(BYTE20_SPEC, 32)
    rows = t32.collect()
    assert len(rows) == 1
    assert (rows[0]["h"], rows[0]["w"]) == (20, 20)
    assert np.array_equal(materialize_full(t32, s32), BYTE20)


def test_retile_sparse_fills_init(spark):
    # drop tile (0, 1); its pixels must come back as spec.init (0)
    sparse = byte20_tiles(spark).filter("NOT (ty = 0 AND tx = 1)")
    t10 = retile(sparse, BYTE20_SPEC, 10)
    s10 = retile_spec(BYTE20_SPEC, 10)
    dense = BYTE20.copy()
    dense[0:16, 16:20] = 0
    got = materialize_full(t10, s10)
    assert np.array_equal(got, dense)
    # target tiles fully inside the dropped region are absent, not zero-filled
    keys = {(r["ty"], r["tx"]) for r in t10.select("ty", "tx").collect()}
    assert keys == {(0, 0), (0, 1), (1, 0), (1, 1)}
