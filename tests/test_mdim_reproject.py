"""gdal mdim reproject (apps/gdalalg_mdim_reproject.cpp): warp the
(y, x) plane of an MDArray between grids/CRSs as AsClassicDataset →
distributed GridTMS warp → re-chunk. Verified vs local numpy index
replicas of the nearest rule."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.geom.proj import Pipeline
from gdal_spark.operators.multidim import (
    MDArraySpec,
    from_numpy,
    mdim_reproject,
)
from gdal_spark.operators.raster import RasterSpec

SPEC = MDArraySpec(
    name="temp",
    dims=(("time", 3), ("y", 12), ("x", 10)),
    chunks=(1, 4, 4),
    dtype="float64",
)
SRC_GT = (0.0, 1.0, 0.0, 12.0, 0.0, -1.0)


@pytest.fixture(scope="module")
def cube():
    rng = np.random.default_rng(11)
    return rng.uniform(250, 320, size=(3, 12, 10))


def _to_numpy(df, spec):
    out = np.full([s for _, s in spec.dims], np.nan)
    for r in df.collect():
        key = list(r["chunk"])
        shape = spec.chunk_shape(key)
        block = np.frombuffer(r["payload"], dtype=spec.dtype).reshape(shape)
        sl = tuple(
            slice(key[d] * spec.chunks[d], key[d] * spec.chunks[d] + shape[d])
            for d in range(spec.ndim)
        )
        out[sl] = block
    return out


class TestMdimReproject:
    def test_identity_grid_roundtrip(self, spark, cube):
        df = from_numpy(spark, cube, SPEC)
        dst = RasterSpec(width=10, height=12, gt=SRC_GT, dtype="float64",
                         nbands=1, tile_size=8)
        out_df, out_spec = mdim_reproject(
            df, SPEC, "y", "x", SRC_GT, Pipeline(), dst,
            resampling="near", fixed={"time": 1},
        )
        assert [s for _, s in out_spec.dims] == [12, 10]
        got = _to_numpy(out_df, out_spec)
        np.testing.assert_array_equal(got, cube[1])

    def test_nearest_downsample_2x(self, spark, cube):
        # dst pixel centers land on src coords 1, 3, 5, ... -> the
        # nearest rule (GWKNearest floor of the center coord) picks
        # every second src pixel starting at index 1
        df = from_numpy(spark, cube, SPEC)
        dgt = (0.0, 2.0, 0.0, 12.0, 0.0, -2.0)
        dst = RasterSpec(width=5, height=6, gt=dgt, dtype="float64",
                         nbands=1, tile_size=4)
        out_df, out_spec = mdim_reproject(
            df, SPEC, "y", "x", SRC_GT, Pipeline(), dst,
            resampling="near", fixed={"time": 2},
        )
        got = _to_numpy(out_df, out_spec)
        np.testing.assert_array_equal(got, cube[2][1::2, 1::2])

    def test_requires_fixed_extra_dims(self, spark, cube):
        df = from_numpy(spark, cube, SPEC)
        dst = RasterSpec(width=10, height=12, gt=SRC_GT, dtype="float64",
                         nbands=1, tile_size=8)
        with pytest.raises(ValueError):
            mdim_reproject(df, SPEC, "y", "x", SRC_GT, Pipeline(), dst)
