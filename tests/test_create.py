"""gdal raster create (apps/gdalalg_raster_create.cpp) — sizing rules,
burn semantics, spec-only constant rasters."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators.create import raster_create
from gdal_spark.operators.raster import RasterSpec


def test_bbox_resolution_sizing_and_gt():
    # :476-491 ceil(extent/res - EPSILON); gt :612-623
    spec, _ = raster_create(bbox=(10.0, 20.0, 110.0, 70.0), resolution=(10.0, 10.0))
    assert (spec.width, spec.height) == (10, 5)
    assert spec.gt == (10.0, 10.0, 0.0, 70.0, 0.0, -10.0)


def test_bbox_resolution_non_divisible_rounds_up():
    spec, _ = raster_create(bbox=(0.0, 0.0, 101.0, 49.0), resolution=(10.0, 10.0))
    # ceil(10.1 - eps) = 11, ceil(4.9 - eps) = 5
    assert (spec.width, spec.height) == (11, 5)
    # gt rescales to the requested extent, not the resolution
    assert spec.gt[1] == 101.0 / 11
    assert spec.gt[5] == -49.0 / 5


def test_size_zero_axis_from_bbox_aspect():
    # :513-534 — width 0 infers from the bbox aspect
    spec, _ = raster_create(size=(0, 50), bbox=(0.0, 0.0, 200.0, 100.0))
    assert (spec.width, spec.height) == (100, 50)
    spec, _ = raster_create(size=(40, 0), bbox=(0.0, 0.0, 200.0, 100.0))
    assert (spec.width, spec.height) == (40, 20)


def test_like_inherits_and_percent_size():
    like = RasterSpec(width=200, height=100, gt=(0, 2, 0, 0, 0, -2), dtype="int16", nbands=3)
    spec, _ = raster_create(like=like, like_nodata=-9.0)
    assert (spec.width, spec.height, spec.nbands, spec.dtype) == (200, 100, 3, "int16")
    spec, _ = raster_create(size=("50%", "50 %"), like=like)
    assert (spec.width, spec.height) == (100, 50)


def test_like_resolution_recomputes_size():
    # :431-473 — res 1.0 against a 2.0-px like doubles the grid
    like = RasterSpec(width=200, height=100, gt=(0, 2, 0, 0, 0, -2))
    spec, _ = raster_create(like=like, resolution=(1.0, 0.0))
    assert (spec.width, spec.height) == (400, 200)


def test_percent_without_like_raises():
    with pytest.raises(ValueError, match="percentage"):
        raster_create(size=("50%", 10))


def test_resolution_without_bbox_or_like_raises():
    with pytest.raises(ValueError, match="resolution without"):
        raster_create(resolution=(1.0, 1.0))


def test_burn_count_validation():
    with pytest.raises(ValueError, match="One value"):
        raster_create(size=(4, 4), burn=[1.0, 2.0])
    with pytest.raises(ValueError, match="One or 3 values"):
        raster_create(size=(4, 4), band_count=3, burn=[1.0, 2.0])


def test_uniform_burn_is_spec_only():
    spec, tiles = raster_create(size=(1_000_000, 1_000_000), burn=[7.0])
    assert tiles is None  # zero bytes, zero tasks
    assert spec.init == 7.0


def test_uniform_burn_empty_tile_table(spark):
    spec, tiles = raster_create(size=(8, 8), burn=[7.0], spark=spark)
    assert tiles.count() == 0 and spec.init == 7.0


def test_per_band_burn_materializes(spark):
    spec, tiles = raster_create(
        size=(5, 3), band_count=2, burn=[3.0, 250.9], tile_size=4, spark=spark
    )
    rows = tiles.collect()
    # 2 bands x 1 ty x 2 tx
    assert len(rows) == 4
    by_key = {(r.band, r.ty, r.tx): r for r in rows}
    a = np.frombuffer(by_key[(1, 0, 0)].payload, dtype=np.uint8).reshape(3, 4)
    assert (a == 3).all()
    b = np.frombuffer(by_key[(2, 0, 1)].payload, dtype=np.uint8).reshape(3, 1)
    assert (b == 251).all()  # GDALCopyWord round-half-away
    assert by_key[(2, 0, 1)].w == 1 and by_key[(2, 0, 1)].h == 3


def test_nodata_none_string_unsets():
    spec, _ = raster_create(size=(4, 4), nodata="none")
    assert isinstance(spec, RasterSpec)
