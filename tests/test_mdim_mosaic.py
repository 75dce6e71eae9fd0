"""mdim mosaic (gdalalg_mdim_mosaic.cpp): lattice-union placement,
write-order overlap, nodata fill, N-D."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators.multidim import MDArraySpec, from_numpy, mdim_mosaic


def materialize(out_df, out_spec):
    shape = [s for _, s in out_spec.dims]
    got = np.full(shape, np.nan)
    ch = out_spec.chunks
    for r in out_df.collect():
        ci = list(r["chunk"])
        shp = [min((ci[d] + 1) * ch[d], shape[d]) - ci[d] * ch[d] for d in range(len(shape))]
        sel = tuple(slice(ci[d] * ch[d], ci[d] * ch[d] + shp[d]) for d in range(len(shape)))
        got[sel] = np.frombuffer(r["payload"], dtype=out_spec.dtype).reshape(shp)
    return got


class TestMosaic2D:
    def test_union_overlap_nodata(self, spark):
        a = np.arange(24, dtype=np.float64).reshape(4, 6)
        b = np.arange(24, dtype=np.float64).reshape(4, 6) + 100
        sa = MDArraySpec("a", (("y", 4), ("x", 6)), (2, 3))
        sb = MDArraySpec("b", (("y", 4), ("x", 6)), (2, 3))
        out_df, out_spec = mdim_mosaic(
            [(from_numpy(spark, a, sa), sa, (0.0, 0.0)),
             (from_numpy(spark, b, sb), sb, (2.0, 4.0))],
            (1.0, 1.0), nodata=-1.0,
        )
        assert out_spec.dims == (("y", 6), ("x", 10))
        want = np.full((6, 10), -1.0)
        want[0:4, 0:6] = a
        want[2:6, 4:10] = b  # later source wins
        np.testing.assert_array_equal(materialize(out_df, out_spec), want)

    def test_non_unit_increment_and_order(self, spark):
        a = np.ones((2, 2))
        b = np.full((2, 2), 2.0)
        s = MDArraySpec("a", (("y", 2), ("x", 2)), (2, 2))
        # increment 0.5: b's start 1.0 -> offset 2
        out_df, out_spec = mdim_mosaic(
            [(from_numpy(spark, b, s), s, (0.0, 1.0)),
             (from_numpy(spark, a, s), s, (0.0, 0.0))],
            (0.5, 0.5), nodata=0.0,
        )
        got = materialize(out_df, out_spec)
        want = np.zeros((2, 4))
        want[:, 2:4] = 2.0
        want[:, 0:2] = 1.0  # a written later, wins where it covers
        np.testing.assert_array_equal(got, want)

    def test_off_lattice_start_raises(self, spark):
        s = MDArraySpec("a", (("y", 2), ("x", 2)), (2, 2))
        df = from_numpy(spark, np.ones((2, 2)), s)
        with pytest.raises(ValueError):
            mdim_mosaic([(df, s, (0.0, 0.0)), (df, s, (0.0, 0.3))], (1.0, 1.0))


class Test3D:
    def test_3d_mosaic(self, spark):
        a = np.arange(8, dtype=np.float64).reshape(2, 2, 2)
        s = MDArraySpec("a", (("t", 2), ("y", 2), ("x", 2)), (1, 2, 2))
        out_df, out_spec = mdim_mosaic(
            [(from_numpy(spark, a, s), s, (0.0, 0.0, 0.0)),
             (from_numpy(spark, a + 10, s), s, (2.0, 0.0, 0.0))],
            (1.0, 1.0, 1.0), nodata=-1.0,
        )
        assert out_spec.dims[0] == ("t", 4)
        got = materialize(out_df, out_spec)
        np.testing.assert_array_equal(got[:2], a)
        np.testing.assert_array_equal(got[2:], a + 10)
