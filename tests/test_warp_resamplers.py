"""Warp resampler kernels vs brute-force per-pixel replicas of the
reference formulas (the autotest/alg/warp.py strategy: every resampler
compared against an independent implementation, maxdiff ~ fp noise).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.operators.tiles import (
    AREA_KERNELS,
    _cubic_spline_weight,
    _lanczos_weight,
    _mode_first,
    warp_average,
    warp_cubicspline,
    warp_lanczos,
    warp_sum,
)

rng = np.random.default_rng(42)
SRC = rng.integers(0, 255, size=(17, 23)).astype(np.float64)


def _ref_filter(src, sx, sy, wf, radius):
    """Scalar GWKResample replica (gdalwarpkernel.cpp:4029-4160)."""
    h, w = src.shape
    filt_init = ((radius + 1) % 2) - radius
    ix = math.floor(sx - 0.5)
    iy = math.floor(sy - 0.5)
    dx = sx - 0.5 - ix
    dy = sy - 0.5 - iy
    acc = wsum = 0.0
    for j in range(filt_init, radius + 1):
        cy = iy + j
        if cy < 0 or cy >= h:
            continue
        wy = wf(np.array([j - dy]))[0]
        for i in range(filt_init, radius + 1):
            cx = ix + i
            if cx < 0 or cx >= w:
                continue
            wt = wy * wf(np.array([i - dx]))[0]
            acc += wt * src[cy, cx]
            wsum += wt
    if wsum < 1e-6:
        return None
    return acc / wsum


@pytest.mark.parametrize(
    "kernel,wf,radius",
    [(warp_cubicspline, _cubic_spline_weight, 2), (warp_lanczos, _lanczos_weight, 3)],
)
def test_filter_kernels_match_reference(kernel, wf, radius):
    sx = rng.uniform(-1.0, SRC.shape[1] + 1.0, size=200)
    sy = rng.uniform(-1.0, SRC.shape[0] + 1.0, size=200)
    out, valid = kernel(SRC, sx, sy)
    for k in range(200):
        ref = _ref_filter(SRC, sx[k], sy[k], wf, radius)
        if ref is None:
            assert not valid[k]
        else:
            assert valid[k]
            assert out[k] == pytest.approx(ref, rel=1e-12, abs=1e-9)


def test_cubic_spline_weights_sum_to_one():
    # B-spline partition of unity across the 4 taps
    for d in np.linspace(0, 0.999, 20):
        taps = [_cubic_spline_weight(np.array([j - d]))[0] for j in range(-1, 3)]
        assert sum(taps) == pytest.approx(1.0, abs=1e-12)


def test_lanczos_exact_hit_is_identity():
    # integer-centered sample: delta 0 -> only w(0)=1 tap
    out, valid = warp_lanczos(SRC, np.array([5.5]), np.array([7.5]))
    assert valid[0] and out[0] == pytest.approx(SRC[7, 5])


def _ref_window(src, xa, ya, xb, yb):
    """Scalar footprint window (gdalwarpkernel.cpp:6992-7006)."""
    h, w = src.shape
    EPS = 1e-10
    xmin, xmax = min(xa, xb), max(xa, xb)
    ymin, ymax = min(ya, yb), max(ya, yb)
    ix0 = max(int(math.floor(xmin + EPS)), 0)
    ix1 = min(int(math.ceil(xmax - EPS)), w)
    if ix0 == ix1 and ix1 < w:
        ix1 += 1
    iy0 = max(int(math.floor(ymin + EPS)), 0)
    iy1 = min(int(math.ceil(ymax - EPS)), h)
    if iy0 == iy1 and iy1 < h:
        iy1 += 1
    if ix1 <= ix0 or iy1 <= iy0:
        return None
    return src[iy0:iy1, ix0:ix1]


@pytest.mark.parametrize("stat", ["min", "max", "med", "q1", "q3", "rms", "mode"])
def test_window_stats_match_reference(stat):
    kernel = AREA_KERNELS[stat]
    n = 150
    xa = rng.uniform(0, SRC.shape[1] - 0.01, size=n)
    ya = rng.uniform(0, SRC.shape[0] - 0.01, size=n)
    xb = xa + rng.uniform(0.3, 4.0, size=n)
    yb = ya + rng.uniform(0.3, 4.0, size=n)
    out, ok = kernel(SRC, xa, ya, xb, yb)
    for k in range(n):
        win = _ref_window(SRC, xa[k], ya[k], xb[k], yb[k])
        if win is None:
            assert not ok[k]
            continue
        v = win.ravel()
        if stat == "min":
            ref = v.min()
        elif stat == "max":
            ref = v.max()
        elif stat == "rms":
            ref = math.sqrt(float(np.mean(v * v)))
        elif stat == "mode":
            ref = _mode_first(v.astype(np.int64).reshape(1, -1))[0]
        else:
            q = {"med": 0.5, "q1": 0.25, "q3": 0.75}[stat]
            s = np.sort(v)
            ref = s[max(int(math.ceil(q * len(s) - 1)), 0)]
        assert ok[k]
        assert out[k] == pytest.approx(ref, rel=1e-12)


def test_mode_first_tie_strategy():
    # scan order: 1,2,2,1 -> 2 reaches count 2 first (gdalwarpkernel.cpp:8141)
    assert _mode_first(np.array([[1, 2, 2, 1]]))[0] == 2
    assert _mode_first(np.array([[3, 1, 3, 1]]))[0] == 3
    assert _mode_first(np.array([[5, 5, 1, 1, 1]]))[0] == 1


def test_sum_preserving():
    """2x downsample: dst footprints tile the source exactly, so the
    dst sum equals the src sum (GWKSumPreserving contract)."""
    src = rng.integers(0, 100, size=(8, 8)).astype(np.float64)
    # dst 4x4, each dst pixel footprint = 2x2 src box
    gy, gx = np.mgrid[0:4, 0:4]
    xa, ya = gx * 2.0, gy * 2.0
    xb, yb = xa + 2.0, ya + 2.0
    out, ok = warp_sum(src, xa.ravel(), ya.ravel(), xb.ravel(), yb.ravel())
    assert ok.all()
    assert out.sum() == pytest.approx(src.sum())


def test_sum_fractional_overlap():
    src = np.ones((4, 4))
    out, ok = warp_sum(src, np.array([0.5]), np.array([0.5]), np.array([2.5]), np.array([2.5]))
    assert out[0] == pytest.approx(4.0)  # 2x2 area of density 1


def test_average_unchanged():
    # regression guard: the original average kernel still matches a
    # brute-force mean over the same windows
    n = 80
    xa = rng.uniform(0, SRC.shape[1] - 0.01, size=n)
    ya = rng.uniform(0, SRC.shape[0] - 0.01, size=n)
    xb = xa + rng.uniform(0.3, 3.0, size=n)
    yb = ya + rng.uniform(0.3, 3.0, size=n)
    out, ok = warp_average(SRC, xa, ya, xb, yb)
    for k in range(n):
        win = _ref_window(SRC, xa[k], ya[k], xb[k], yb[k])
        if win is not None:
            assert out[k] == pytest.approx(win.mean(), rel=1e-12)


def test_mode_keeps_float_values():
    """Float rasters must not be int-truncated before the mode
    (round-2 review finding): GDAL's integer-bin path is for integer
    band types only."""
    src = np.array([[1.5, 1.5], [2.7, 9.9]])
    kernel = AREA_KERNELS["mode"]
    out, ok = kernel(src, np.array([0.0]), np.array([0.0]), np.array([2.0]), np.array([2.0]))
    assert ok[0] and out[0] == 1.5


def test_mode_ties_min_max():
    """MODE_TIES=MIN/MAX (gdalwarper.h GWKTS_Min/Max,
    gdalwarpkernel.cpp:7190-7203): among tied max-count values, MIN
    takes the smallest, MAX the largest; a strict winner ignores the
    strategy."""
    from gdal_spark.operators.tiles import _mode_tie

    tied = np.array([[1.0, 2.0, 2.0, 1.0, 7.0]])  # 1 and 2 tie at 2
    assert _mode_tie(tied, "min")[0] == 1.0
    assert _mode_tie(tied, "max")[0] == 2.0
    strict = np.array([[3.0, 3.0, 3.0, 9.0, 1.0]])
    assert _mode_tie(strict, "min")[0] == 3.0
    assert _mode_tie(strict, "max")[0] == 3.0


def test_mode_ties_kernel_dispatch():
    """mode_min / mode_max registered as area resamplers."""
    from gdal_spark.operators.tiles import AREA_KERNELS

    src = np.array([[1.0, 2.0], [2.0, 1.0]])
    out_min, ok = AREA_KERNELS["mode_min"](src, np.array([0.0]), np.array([0.0]), np.array([2.0]), np.array([2.0]))
    out_max, _ = AREA_KERNELS["mode_max"](src, np.array([0.0]), np.array([0.0]), np.array([2.0]), np.array([2.0]))
    assert ok.all()
    assert out_min[0] == 1.0 and out_max[0] == 2.0


# ---------------------------------------------------------------------------
# src-nodata validity masks + EXCLUDED_VALUES (gdalwarpkernel.cpp:6864+,
# 7787-7931) vs brute-force scalar replicas

_VM_RNG = np.random.default_rng(7)
_VM_SRC = _VM_RNG.integers(0, 6, (12, 12)).astype(np.float64)
_VM_MASK = _VM_RNG.random((12, 12)) > 0.3
_VM_J, _VM_I = np.meshgrid(np.arange(4), np.arange(4))
_VM_SXA, _VM_SYA = (_VM_J * 3).astype(float), (_VM_I * 3).astype(float)
_VM_SXB, _VM_SYB = _VM_SXA + 3.0, _VM_SYA + 3.0


def _valid_window(i, j):
    return [
        _VM_SRC[y, x]
        for y in range(i * 3, i * 3 + 3)
        for x in range(j * 3, j * 3 + 3)
        if _VM_MASK[y, x]
    ]


def _ref_masked_stat(stat, vals, mode_ties="first"):
    """Scalar GWKAverageOrMode over the valid samples only."""
    if stat == "min":
        return min(vals)
    if stat == "max":
        return max(vals)
    if stat == "rms":
        return math.sqrt(sum(v * v for v in vals) / len(vals))
    if stat == "mode":
        from collections import Counter

        counts = Counter(vals)
        mx = max(counts.values())
        if mode_ties == "first":
            run = Counter()
            for v in vals:  # first value whose count reaches the max
                run[v] += 1
                if run[v] == mx:
                    return v
        cand = [v for v, n in counts.items() if n == mx]
        return min(cand) if mode_ties == "min" else max(cand)
    quant = {"med": 0.5, "q1": 0.25, "q3": 0.75}[stat]
    s = sorted(vals)
    return s[max(int(math.ceil(quant * len(s) - 1)), 0)]


@pytest.mark.parametrize("stat", ["min", "max", "med", "q1", "q3", "rms", "mode"])
def test_window_stats_vmask_matches_reference(stat):
    from gdal_spark.operators.tiles import make_window_stat_kernel

    k = make_window_stat_kernel(stat)
    got, ok = k(_VM_SRC, _VM_SXA, _VM_SYA, _VM_SXB, _VM_SYB, vmask=_VM_MASK)
    for i in range(4):
        for j in range(4):
            vals = _valid_window(i, j)
            assert ok[i, j] == bool(vals)
            if vals:
                assert got[i, j] == pytest.approx(_ref_masked_stat(stat, vals))


@pytest.mark.parametrize("ties", ["first", "min", "max"])
def test_mode_vmask_tie_strategies(ties):
    from gdal_spark.operators.tiles import make_window_stat_kernel

    k = make_window_stat_kernel("mode", mode_ties=ties)
    got, ok = k(_VM_SRC, _VM_SXA, _VM_SYA, _VM_SXB, _VM_SYB, vmask=_VM_MASK)
    for i in range(4):
        for j in range(4):
            vals = _valid_window(i, j)
            if vals:
                assert got[i, j] == _ref_masked_stat("mode", vals, ties)


def test_window_stats_vmask_none_unchanged():
    from gdal_spark.operators.tiles import make_window_stat_kernel

    for stat in ("min", "max", "med", "rms", "mode"):
        k = make_window_stat_kernel(stat)
        a, oka = k(_VM_SRC, _VM_SXA, _VM_SYA, _VM_SXB, _VM_SYB)
        b, okb = k(_VM_SRC, _VM_SXA, _VM_SYA, _VM_SXB, _VM_SYB, vmask=None)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(oka, okb)


def test_parse_excluded_values():
    from gdal_spark.operators.tiles import parse_excluded_values

    assert parse_excluded_values(None, 3) is None
    assert parse_excluded_values("200", 1) == [(200.0,)]
    assert parse_excluded_values("1,2,3", 3) == [(1.0, 2.0, 3.0)]
    assert parse_excluded_values("(1,2,3),(4,5,6)", 3) == [(1.0, 2.0, 3.0), (4.0, 5.0, 6.0)]
    assert parse_excluded_values([7], 1) == [(7.0,)]
    with pytest.raises(ValueError):
        parse_excluded_values("1,2", 3)


def test_average_excluded_matches_reference():
    """warp_average_excluded vs a scalar replica of the joint-band
    average path (gdalwarpkernel.cpp:7787-7931): per-window counts of
    invalid / excluded / regular samples, threshold tests in the
    reference's order, most-represented tuple on the excluded branch."""
    from gdal_spark.operators.tiles import parse_excluded_values, warp_average_excluded

    rng = np.random.default_rng(11)
    b1 = rng.integers(0, 4, (12, 12)).astype(np.float64)
    b2 = rng.integers(0, 4, (12, 12)).astype(np.float64)
    vmask = rng.random((12, 12)) > 0.25
    excl = parse_excluded_values("(1,2),(3,0)", 2)
    excl_pct, nodata_pct = 0.3, 0.5
    outs, dv = warp_average_excluded(
        [b1, b2], vmask, excl, _VM_SXA, _VM_SYA, _VM_SXB, _VM_SYB,
        excl_pct=excl_pct, nodata_pct=nodata_pct,
    )
    for i in range(4):
        for j in range(4):
            W = I = E = R = 0
            counts = [0] * len(excl)
            sums = [0.0, 0.0]
            for y in range(i * 3, i * 3 + 3):
                for x in range(j * 3, j * 3 + 3):
                    W += 1
                    if not vmask[y, x]:
                        I += 1
                        continue
                    for t, tup in enumerate(excl):
                        if b1[y, x] == tup[0] and b2[y, x] == tup[1]:
                            counts[t] += 1
                            E += 1
                            break
                    else:
                        R += 1
                        sums[0] += b1[y, x]
                        sums[1] += b2[y, x]
            if I > 0 and I >= nodata_pct * W:
                want_valid, want = False, None
            elif E > 0 and E >= excl_pct * W:
                best = max(range(len(excl)), key=lambda t: (counts[t], -t))
                want_valid, want = True, excl[best]
            elif R > 0:
                want_valid, want = True, (sums[0] / R, sums[1] / R)
            else:
                want_valid, want = False, None
            assert dv[i, j] == want_valid, (i, j)
            if want_valid:
                assert outs[0][i, j] == pytest.approx(want[0])
                assert outs[1][i, j] == pytest.approx(want[1])
