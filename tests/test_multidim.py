"""Multidim array model tests (gcore/multidim GetView /
AsClassicDataset / ComputeStatistics semantics) vs local numpy."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators.multidim import (
    MDArraySpec,
    as_classic,
    from_numpy,
    mdim_statistics,
    slice_array,
)

SPEC = MDArraySpec(
    name="temp",
    dims=(("time", 5), ("y", 12), ("x", 10)),
    chunks=(2, 4, 4),
    dtype="float64",
    attrs={"units": "K"},
)


@pytest.fixture(scope="module")
def cube():
    rng = np.random.default_rng(3)
    return rng.uniform(250, 320, size=(5, 12, 10))


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


class TestMultidim:
    def test_roundtrip(self, spark, cube):
        df = from_numpy(spark, cube, SPEC)
        np.testing.assert_array_equal(_to_numpy(df, SPEC), cube)

    def test_slice_matches_numpy(self, spark, cube):
        df = from_numpy(spark, cube, SPEC)
        ranges = [(1, 4), (2, 11), (3, 9)]
        sliced, sspec = slice_array(df, SPEC, ranges)
        assert [s for _, s in sspec.dims] == [3, 9, 6]
        got = _to_numpy(sliced, sspec)
        np.testing.assert_array_equal(got, cube[1:4, 2:11, 3:9])

    def test_slice_prunes_chunks(self, spark, cube):
        df = from_numpy(spark, cube, SPEC)
        # a range inside one chunk per dim should read exactly 1 chunk
        sliced, _ = slice_array(df, SPEC, [(0, 2), (0, 4), (0, 4)])
        # the crop stage input is the pruned set; count the OUTPUT rows
        assert sliced.count() == 1

    def test_as_classic_feeds_raster_engine(self, spark, cube):
        from gdal_spark.operators.raster import as_features

        df = from_numpy(spark, cube, SPEC)
        tiles, rspec = as_classic(df, SPEC, y_dim="y", x_dim="x", fixed={"time": 3})
        assert (rspec.height, rspec.width) == (12, 10)
        pix = {(r.py, r.px): r.value for r in as_features(tiles, rspec).collect()}
        for yy in range(12):
            for xx in range(10):
                assert pix[(yy, xx)] == pytest.approx(cube[3, yy, xx])

    def test_statistics(self, spark, cube):
        df = from_numpy(spark, cube, SPEC)
        st = mdim_statistics(df, SPEC)
        assert st["min"] == pytest.approx(cube.min())
        assert st["max"] == pytest.approx(cube.max())
        assert st["mean"] == pytest.approx(cube.mean())
        assert st["std"] == pytest.approx(cube.std(), rel=1e-9)
