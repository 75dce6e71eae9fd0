"""gdal mdim compare (apps/gdalalg_mdim_compare.cpp CompareArray
metrics) + GDALMDArray::Transpose vs local numpy."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators.multidim import (
    MDArraySpec,
    from_numpy,
    mdim_compare,
    mdim_transpose,
)

SPEC = MDArraySpec(
    name="cube",
    dims=(("time", 3), ("y", 7), ("x", 5)),
    chunks=(2, 3, 2),
    dtype="float64",
)


@pytest.fixture(scope="module")
def cube():
    rng = np.random.default_rng(5)
    return rng.uniform(0, 100, size=(3, 7, 5))


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


class TestTranspose:
    @pytest.mark.parametrize("axes", [(2, 0, 1), (1, 0, 2), (2, 1, 0), (0, 1, 2)])
    def test_matches_numpy(self, spark, cube, axes):
        df = from_numpy(spark, cube, SPEC)
        out_df, out_spec = mdim_transpose(df, SPEC, axes)
        assert [s for _, s in out_spec.dims] == [cube.shape[a] for a in axes]
        assert out_spec.chunks == tuple(SPEC.chunks[a] for a in axes)
        np.testing.assert_array_equal(_to_numpy(out_df, out_spec), cube.transpose(axes))

    def test_rejects_bad_axes(self, spark, cube):
        df = from_numpy(spark, cube, SPEC)
        with pytest.raises(ValueError):
            mdim_transpose(df, SPEC, (0, 0, 1))


class TestCompare:
    def test_identical_arrays(self, spark, cube):
        a = from_numpy(spark, cube, SPEC)
        b = from_numpy(spark, cube, SPEC)
        out = mdim_compare(a, SPEC, b, SPEC)
        assert out["pixels_differing"] == 0
        assert out["max_diff"] == 0.0
        assert out["rmsd"] == 0.0
        assert out["report"] == []

    def test_diff_metrics_match_numpy(self, spark, cube):
        other = cube.copy()
        other[1, 2, 3] += 4.0
        other[0, 0, 0] -= 2.5
        other[2, 6, 4] += 1.0
        a = from_numpy(spark, cube, SPEC)
        b = from_numpy(spark, other, SPEC)
        out = mdim_compare(a, SPEC, b, SPEC)
        d = cube - other
        assert out["pixels_differing"] == int(np.count_nonzero(d))
        assert out["max_diff"] == pytest.approx(np.max(np.abs(d)))
        assert out["rmsd"] == pytest.approx(np.sqrt(np.mean(d * d)))
        # float path PSNR: 20*log10((refmax-refmin)/rmsd), :566-570
        amp = cube.max() - cube.min()
        assert out["psnr"] == pytest.approx(20 * np.log10(amp / out["rmsd"]))
        assert any("maximum pixel value difference" in s for s in out["report"])

    def test_integer_psnr_amplitude(self, spark):
        spec = MDArraySpec("b", (("y", 4), ("x", 4)), (2, 2), dtype="uint8")
        a = np.arange(16, dtype=np.uint8).reshape(4, 4)
        other = a.copy()
        other[0, 0] += 3
        out = mdim_compare(
            from_numpy(spark, a, spec), spec, from_numpy(spark, other, spec), spec
        )
        rmsd = np.sqrt(9.0 / 16.0)
        assert out["rmsd"] == pytest.approx(rmsd)
        assert out["psnr"] == pytest.approx(20 * np.log10(255.0 / rmsd))

    def test_shape_mismatch_reported(self, spark, cube):
        spec2 = MDArraySpec("cube", (("time", 3), ("y", 7), ("x", 4)), (2, 3, 2))
        a = from_numpy(spark, cube, SPEC)
        b = from_numpy(spark, np.zeros((3, 7, 4)), spec2)
        out = mdim_compare(a, SPEC, b, spec2)
        assert any("shape in reference" in s for s in out["report"])
        assert "pixels_differing" not in out
