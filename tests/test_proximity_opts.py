"""GDALComputeProximity option set (alg/gdalproximity.cpp:64-92,
355-393): DISTUNITS=GEO, FIXED_BUF_VAL, USE_INPUT_NODATA over the
exact separable EDT."""

from __future__ import annotations

import numpy as np
import pytest

import dataclasses

from gdal_spark.operators.proximity import proximity
from gdal_spark.operators.raster import RasterSpec, materialize_full

SPEC = RasterSpec(width=8, height=6, gt=(100.0, 30.0, 0.0, 500.0, 0.0, -30.0),
                  dtype="uint8", tile_size=4)
FSPEC = dataclasses.replace(SPEC, dtype="float64")


def _tiles(spark, arr):
    rows = []
    for ty in range(SPEC.ntiles_y):
        for tx in range(SPEC.ntiles_x):
            h, w = SPEC.tile_shape(ty, tx)
            sub = np.ascontiguousarray(arr[ty * 4: ty * 4 + h, tx * 4: tx * 4 + w])
            rows.append((1, ty, tx, h, w, "uint8", sub.tobytes()))
    return spark.createDataFrame(
        rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary")


def _src(spark):
    a = np.zeros((6, 8), dtype=np.uint8)
    a[2, 3] = 1  # single target
    a[0, 0] = 7  # "nodata" marker pixel (non-target since VALUES=[1])
    return a, _tiles(spark, a)


def test_geo_units_scale_distance_and_maxdist(spark):
    a, t = _src(spark)
    # pixel distances to (2,3), scaled by |gt1| = 30
    out = proximity(t, SPEC, target_values=[1], distunits="GEO",
                    maxdist=60.0, nodata=-1.0)
    d = materialize_full(out, FSPEC)
    assert d[2, 3] == 0.0
    assert d[2, 4] == 30.0
    assert d[2, 5] == 60.0
    assert d[0, 3] == 60.0
    assert d[2, 6] == -1.0  # 3 px = 90 geo units > maxdist 60
    assert d[1, 4] == pytest.approx(np.sqrt(2) * 30.0)


def test_fixed_buf_val(spark):
    a, t = _src(spark)
    out = proximity(t, SPEC, target_values=[1], maxdist=2.0,
                    fixed_buf_val=99.0, nodata=-1.0)
    d = materialize_full(out, FSPEC)
    assert d[2, 3] == 0.0          # target stays 0 (:385 >0 guard)
    assert d[2, 4] == 99.0
    assert d[1, 2] == 99.0
    assert d[2, 6] == -1.0         # beyond maxdist -> nodata


def test_use_input_nodata(spark):
    a, t = _src(spark)
    out = proximity(t, SPEC, target_values=[1], src_nodata=7.0,
                    use_input_nodata=True, nodata=-1.0)
    d = materialize_full(out, FSPEC)
    assert d[0, 0] == -1.0                      # masked src nodata
    assert d[2, 4] == 1.0                       # others unaffected
    assert d[0, 1] == pytest.approx(np.sqrt(8.0))


def test_option_validation(spark):
    a, t = _src(spark)
    with pytest.raises(ValueError, match="DISTUNITS"):
        proximity(t, SPEC, distunits="FURLONG")
    with pytest.raises(ValueError, match="pixel-space"):
        proximity(t, SPEC, distunits="GEO", squared=True)
    with pytest.raises(ValueError, match="src_nodata"):
        proximity(t, SPEC, use_input_nodata=True)
