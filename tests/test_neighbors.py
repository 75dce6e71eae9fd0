"""`gdal raster neighbors` (VRTKernelFilteredSource FilterData) — the
vectorized kernel vs a direct scalar transliteration of the C++ loop
(vrtfilters.cpp:485-717), and the distributed run vs local."""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.operators.focal import (
    focal_apply_local,
    neighbors,
    neighbors_filter_kernel,
    neighbors_kernel_def,
)
from gdal_spark.operators.raster import RasterSpec


def scalar_filter(
    padded: np.ndarray, coefs: list[float], size: int, method: str, nodata
) -> np.ndarray:
    """Line-by-line transliteration of FilterData (non-separable
    float32 path, scan order preserved)."""
    e = (size - 1) // 2
    src = padded.astype(np.float32)
    hh, ww = src.shape[0] - 2 * e, src.shape[1] - 2 * e
    out = np.zeros((hh, ww), dtype=np.float32)
    nod = np.float32(nodata) if nodata is not None else None
    for oi in range(hh):
        for oj in range(ww):
            ci, cj = oi + e, oj + e
            cv = src[ci, cj]
            if nod is not None and (cv == nod or math.isnan(cv)):
                out[oi, oj] = nod
                continue
            dfSum = 0.0
            dfKernSum = 0.0
            nValid = 0
            dfRes = math.inf if method == "min" else (-math.inf if method == "max" else 0.0)
            dfMean = 0.0
            dfM2 = 0.0
            vals: list[float] = []
            counts: dict[float, int] = {}
            maxCount = 0
            iK = 0
            for di in range(-e, e + 1):
                for dj in range(-e, e + 1):
                    v32 = src[ci + di, cj + dj]
                    c = coefs[iK]
                    iK += 1
                    if nod is not None and (v32 == nod or math.isnan(v32)):
                        continue
                    if c == 0.0:
                        continue
                    dfVal = float(v32) * c
                    nValid += 1
                    if method == "max":
                        if dfVal > dfRes:
                            dfRes = dfVal
                    elif method == "min":
                        if dfVal < dfRes:
                            dfRes = dfVal
                    elif method == "stddev":
                        delta = dfVal - dfMean
                        dfMean += delta / nValid
                        dfM2 += delta * (dfVal - dfMean)
                    elif method == "median":
                        vals.append(dfVal)
                    elif method == "mode":
                        key = dfVal if not math.isnan(dfVal) else float("nan")
                        found = None
                        for k in counts:
                            if k == key or (math.isnan(k) and math.isnan(key)):
                                found = k
                                break
                        if found is None:
                            counts[key] = 1
                            n = 1
                        else:
                            counts[found] += 1
                            n = counts[found]
                        if n > maxCount:
                            maxCount = n
                            dfRes = dfVal
                    else:
                        dfSum += dfVal
                        dfKernSum += c
            fill = nod if nod is not None else np.float32(0.0)
            if method in ("min", "max", "mode"):
                r = np.float32(dfRes) if nValid else fill
            elif method == "stddev":
                r = np.float32(math.sqrt(dfM2 / nValid)) if nValid else fill
            elif method == "median":
                if vals:
                    vals.sort()
                    n = len(vals)
                    if n % 2 == 1:
                        r = np.float32(vals[n // 2])
                    else:
                        r = np.float32((vals[n // 2 - 1] + vals[n // 2]) / 2)
                else:
                    r = fill
            elif method == "sum":
                r = np.float32(dfSum)
            else:  # mean (normalized)
                if nValid == 0 or dfKernSum == 0.0:
                    r = fill
                else:
                    r = np.float32(dfSum / dfKernSum)
            out[oi, oj] = r
    return out.astype(np.float64)


METHODS = ["mean", "sum", "min", "max", "stddev", "median", "mode"]


class TestKernelParity:
    @pytest.mark.parametrize("method", METHODS)
    @pytest.mark.parametrize("nodata", [None, 7.0])
    def test_equal_3x3(self, method, nodata):
        rng = np.random.default_rng(42)
        # small integer values with some nodata hits and repeats (mode)
        arr = rng.integers(0, 9, size=(12, 15)).astype(np.float64)
        size, coefs, m = neighbors_kernel_def("equal", method, 3)
        padded = np.pad(arr, 1, mode="edge")
        got = neighbors_filter_kernel(coefs, size, m, nodata)(padded)
        want = scalar_filter(padded, coefs, size, m, nodata)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("kernel", ["u", "v", "edge1", "edge2", "sharpen", "gaussian"])
    def test_named_kernels_default_method(self, kernel):
        rng = np.random.default_rng(7)
        arr = rng.normal(100, 20, size=(10, 11))
        size, coefs, m = neighbors_kernel_def(kernel)
        padded = np.pad(arr, (size - 1) // 2, mode="edge")
        got = neighbors_filter_kernel(coefs, size, m, None)(padded)
        want = scalar_filter(padded, coefs, size, m, None)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("method", METHODS)
    def test_5x5_with_nodata(self, method):
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 5, size=(9, 9)).astype(np.float64)
        arr[2, 3] = -1  # nodata inside
        kernel = "unsharp-masking" if method == "sum" else "gaussian"
        size, coefs, m = neighbors_kernel_def(kernel, method, 5)
        padded = np.pad(arr, 2, mode="edge")
        got = neighbors_filter_kernel(coefs, size, m, -1.0)(padded)
        want = scalar_filter(padded, coefs, size, m, -1.0)
        np.testing.assert_array_equal(got, want)

    def test_custom_zero_sum_kernel_requires_sum(self):
        with pytest.raises(ValueError):
            neighbors_kernel_def([0, 1, 0, 1, -4, 1, 0, 1, 0], "mean")
        size, coefs, m = neighbors_kernel_def([0, 1, 0, 1, -4, 1, 0, 1, 0])
        assert m == "sum" and size == 3


class TestDistributed:
    def test_distributed_equals_local(self, spark):
        rng = np.random.default_rng(11)
        arr = rng.integers(0, 20, size=(40, 52)).astype(np.float64)
        spec = RasterSpec(width=52, height=40, gt=(0, 1, 0, 0, 0, -1),
                          dtype="float64", nbands=1, tile_size=16)
        rows = []
        for ty in range(spec.ntiles_y):
            for tx in range(spec.ntiles_x):
                h, w = spec.tile_shape(ty, tx)
                oy, ox = ty * 16, tx * 16
                rows.append((1, ty, tx, h, w, "float64",
                             bytes(arr[oy : oy + h, ox : ox + w].tobytes())))
        tiles = spark.createDataFrame(
            rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary"
        )
        for kernel, method in [("equal", "median"), ("gaussian", None), ("equal", "mode")]:
            size, coefs, m = neighbors_kernel_def(kernel, method, 3)
            got_tiles = {
                (r["ty"], r["tx"]): np.frombuffer(r["payload"], dtype=r["dtype"]).reshape(r["h"], r["w"])
                for r in neighbors(tiles, spec, kernel=kernel, method=method, size=3).collect()
            }
            want = neighbors_filter_kernel(coefs, size, m, None)(np.pad(arr, 1, mode="edge"))
            for (ty, tx), t in got_tiles.items():
                y0, x0 = ty * 16, tx * 16
                np.testing.assert_array_equal(
                    t, want[y0 : y0 + t.shape[0], x0 : x0 + t.shape[1]],
                    err_msg=f"tile {(ty, tx)} kernel={kernel} method={method}",
                )
