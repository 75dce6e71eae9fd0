"""invdistnn, per-quadrant round-robin selection, and
average_distance_pts gridding against scalar transliterations of the
reference kernels (alg/gdalgrid.cpp:242 invdistnn, :351 per-quadrant,
:746 MovingAveragePerQuadrant, :2100+ AverageDistancePts)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators.grid import grid_points
from gdal_spark.operators.raster import RasterSpec, materialize_full

SPEC16 = RasterSpec(width=16, height=16, gt=(0.0, 1.0, 0.0, 16.0, 0.0, -1.0),
                    dtype="float64", tile_size=8)
SPEC_ROT = RasterSpec(width=10, height=10, gt=(2.0, 0.5, 0.0, 7.0, 0.0, -0.5),
                      dtype="float64", tile_size=4)


def _pts(n=300, lo=0.0, hi=16.0, seed=42):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, n), rng.uniform(lo, hi, n), rng.uniform(0, 100, n)


def _scalar_invdistnn(xs, ys, zs, cx, cy, power, radius, smoothing,
                      max_points, min_points, nodata, min_ppq=0, max_ppq=0):
    """Transliteration of GDALGridInverseDistanceToAPowerNearestNeighbor
    (gdalgrid.cpp:242) and its PerQuadrant variant (:351), with the
    repo's deterministic (x, y, z) point order standing in for the
    quadtree encounter order."""
    dx = xs - cx
    dy = ys - cy
    d2 = dx * dx + dy * dy
    r2s = d2 + smoothing * smoothing
    entries = []
    for i in np.lexsort((zs, ys, xs)):
        if r2s[i] < 1e-13:
            return zs[i]
        if d2[i] <= radius * radius:
            q = (1 if dx[i] >= 0 else 0) | ((1 if dy[i] >= 0 else 0) << 1)
            entries.append((r2s[i], zs[i], q))
    entries.sort(key=lambda t: t[0])
    num = den = 0.0
    n = 0
    perq = [0, 0, 0, 0]
    if min_ppq or max_ppq:
        byq = [[e for e in entries if e[2] == q] for q in range(4)]
        iters = [0] * 4
        fin = 0
        qi = 0
        while True:
            if iters[qi] >= len(byq[qi]) or (max_ppq and perq[qi] >= max_ppq):
                fin |= 1 << qi
                if fin == 15:
                    break
                qi = (qi + 1) % 4
                continue
            r2, z, _ = byq[qi][iters[qi]]
            iters[qi] += 1
            w = 1.0 / r2 ** (power / 2)
            num += w * z
            den += w
            n += 1
            perq[qi] += 1
            if max_points and n >= max_points:
                break
            qi = (qi + 1) % 4
        if min_ppq and any(p < min_ppq for p in perq):
            return nodata
    else:
        for r2, z, _ in entries:
            w = 1.0 / r2 ** (power / 2)
            num += w * z
            den += w
            n += 1
            if max_points and n >= max_points:
                break
    if n < min_points or den == 0.0:
        return nodata
    return num / den


def _grid_expected(xs, ys, zs, spec, fn):
    out = np.empty((spec.height, spec.width))
    for i in range(spec.height):
        for j in range(spec.width):
            cx, cy = spec.pixel_to_world(j + 0.5, i + 0.5)
            out[i, j] = fn(xs, ys, zs, cx, cy)
    return out


@pytest.mark.parametrize(
    "kw",
    [
        dict(power=2.0, radius=3.0, smoothing=0.0, max_points=12, min_points=1),
        dict(power=3.5, radius=2.0, smoothing=0.5, max_points=5, min_points=8),
        dict(power=2.0, radius=4.0, smoothing=0.0, max_points=16, min_points=1,
             min_points_per_quadrant=1, max_points_per_quadrant=4),
        dict(power=2.0, radius=4.0, smoothing=0.2, max_points=0, min_points=0,
             min_points_per_quadrant=2, max_points_per_quadrant=3),
    ],
)
def test_invdistnn_matches_scalar(spark, kw):
    xs, ys, zs = _pts()
    pts = spark.createDataFrame(pd.DataFrame({"x": xs, "y": ys, "z": zs}))
    g = grid_points(pts, SPEC16, algo="invdistnn", nodata=-9.0, **kw)
    arr = materialize_full(g, SPEC16)
    exp = _grid_expected(
        xs, ys, zs, SPEC16,
        lambda x, y, z, cx, cy: _scalar_invdistnn(
            x, y, z, cx, cy, kw["power"], kw["radius"], kw["smoothing"],
            kw["max_points"], kw["min_points"], -9.0,
            kw.get("min_points_per_quadrant", 0), kw.get("max_points_per_quadrant", 0)))
    np.testing.assert_allclose(arr, exp, rtol=0, atol=1e-10)


def test_invdistnn_exact_hit_beats_radius_and_quadrant_gates(spark):
    # a point exactly on a cell center short-circuits to its z BEFORE
    # the min_points / per-quadrant nodata gates (gdalgrid.cpp:289-295)
    xs = np.array([4.5, 10.0, 10.2])
    ys = np.array([11.5, 2.0, 2.2])
    zs = np.array([77.0, 1.0, 2.0])
    pts = spark.createDataFrame(pd.DataFrame({"x": xs, "y": ys, "z": zs}))
    g = grid_points(pts, SPEC16, algo="invdistnn", radius=2.0, min_points=5,
                    nodata=-9.0, max_points=3, min_points_per_quadrant=2,
                    max_points_per_quadrant=2)
    arr = materialize_full(g, SPEC16)
    # cell (row 4, col 4) has center (4.5, 11.5)
    assert arr[4, 4] == 77.0
    # a far empty cell fails min_points -> nodata
    assert arr[15, 15] == -9.0


def test_invdistnn_rejects_ellipse(spark):
    xs, ys, zs = _pts(10)
    pts = spark.createDataFrame(pd.DataFrame({"x": xs, "y": ys, "z": zs}))
    with pytest.raises(ValueError, match="circular"):
        grid_points(pts, SPEC16, algo="invdistnn", radius=2.0, radius2=1.0)
    with pytest.raises(ValueError, match="finite"):
        grid_points(pts, SPEC16, algo="invdistnn")
    with pytest.raises(ValueError, match="per-quadrant"):
        grid_points(pts, SPEC16, algo="nearest", radius=2.0,
                    max_points_per_quadrant=2)


def _scalar_quadrant_metric(xs, ys, zs, cx, cy, algo, radius1, radius2, angle,
                            min_points, nodata, min_ppq, max_ppq, max_points=0):
    """GDALGrid{MovingAverage,DataMetric*}PerQuadrant transliteration:
    rotate the offset, ellipse-test, quadrant from the ROTATED signs,
    round-robin by in-quadrant distance rank (gdalgrid.cpp:746+)."""
    a = np.deg2rad(angle)
    r1sq, r2sq = radius1 * radius1, radius2 * radius2
    entries = []
    for i in np.lexsort((zs, ys, xs)):
        rx = (xs[i] - cx) * np.cos(a) + (ys[i] - cy) * np.sin(a)
        ry = (ys[i] - cy) * np.cos(a) - (xs[i] - cx) * np.sin(a)
        if r2sq * rx * rx + r1sq * ry * ry <= r1sq * r2sq:
            q = (1 if rx >= 0 else 0) | ((1 if ry >= 0 else 0) << 1)
            entries.append((rx * rx + ry * ry, zs[i], q))
    entries.sort(key=lambda t: t[0])
    byq = [[e for e in entries if e[2] == q] for q in range(4)]
    taken = []
    perq = [0, 0, 0, 0]
    iters = [0] * 4
    fin = 0
    qi = 0
    while True:
        if iters[qi] >= len(byq[qi]) or (max_ppq and perq[qi] >= max_ppq):
            fin |= 1 << qi
            if fin == 15:
                break
            qi = (qi + 1) % 4
            continue
        taken.append(byq[qi][iters[qi]])
        iters[qi] += 1
        perq[qi] += 1
        # global max_points applies to moving average only; the
        # reference comments the break out for data metrics
        if algo == "average" and max_points and len(taken) >= max_points:
            break
        qi = (qi + 1) % 4
    if min_ppq and any(p < min_ppq for p in perq):
        return nodata
    n = len(taken)
    if algo == "count":
        return float(n) if n >= min_points else nodata
    if n < min_points or n == 0:
        return nodata
    vals = [t[1] for t in taken]
    if algo == "average":
        return sum(vals) / n
    if algo == "minimum":
        return min(vals)
    if algo == "maximum":
        return max(vals)
    if algo == "range":
        return max(vals) - min(vals)
    if algo == "average_distance":
        return sum(np.sqrt(t[0]) for t in taken) / n
    raise AssertionError(algo)


@pytest.mark.parametrize("algo", ["average", "minimum", "maximum", "range", "count", "average_distance"])
def test_quadrant_metrics_match_scalar(spark, algo):
    xs, ys, zs = _pts(200, seed=7)
    pts = spark.createDataFrame(pd.DataFrame({"x": xs, "y": ys, "z": zs}))
    kw = dict(radius=4.0, radius2=2.5, angle=30.0, min_points=2,
              min_points_per_quadrant=1, max_points_per_quadrant=3)
    if algo == "average":
        kw["max_points"] = 7
    g = grid_points(pts, SPEC16, algo=algo, nodata=-9.0, **kw)
    arr = materialize_full(g, SPEC16)
    exp = _grid_expected(
        xs, ys, zs, SPEC16,
        lambda x, y, z, cx, cy: _scalar_quadrant_metric(
            x, y, z, cx, cy, algo, 4.0, 2.5, 30.0, 2, -9.0, 1, 3,
            kw.get("max_points", 0)))
    np.testing.assert_allclose(arr, exp, rtol=0, atol=1e-10)


def test_quadrant_average_nonsquare_spec(spark):
    xs, ys, zs = _pts(80, lo=2.0, hi=7.0, seed=3)
    pts = spark.createDataFrame(pd.DataFrame({"x": xs, "y": ys, "z": zs}))
    g = grid_points(pts, SPEC_ROT, algo="average", radius=1.5, nodata=-1.0,
                    max_points_per_quadrant=2)
    arr = materialize_full(g, SPEC_ROT)
    exp = _grid_expected(
        xs, ys, zs, SPEC_ROT,
        lambda x, y, z, cx, cy: _scalar_quadrant_metric(
            x, y, z, cx, cy, "average", 1.5, 1.5, 0.0, 0, -1.0, 0, 2))
    np.testing.assert_allclose(arr, exp, rtol=0, atol=1e-10)


def _scalar_avg_dist_pts(xs, ys, zs, cx, cy, radius1, radius2, angle,
                         min_points, nodata):
    """GDALGridDataMetricAverageDistancePts scalar path: strict i<j
    pairs of in-ellipse points (the quadtree path's self-pair artifact
    is deliberately NOT replicated — see grid_points docstring)."""
    a = np.deg2rad(angle)
    r1sq, r2sq = radius1 * radius1, radius2 * radius2
    inside = []
    for i in range(len(xs)):
        rx = (xs[i] - cx) * np.cos(a) + (ys[i] - cy) * np.sin(a)
        ry = (ys[i] - cy) * np.cos(a) - (xs[i] - cx) * np.sin(a)
        if r2sq * rx * rx + r1sq * ry * ry <= r1sq * r2sq:
            inside.append(i)
    acc = 0.0
    n = 0
    for k in range(len(inside)):
        for j in range(k + 1, len(inside)):
            i1, i2 = inside[k], inside[j]
            acc += np.sqrt((xs[i1] - xs[i2]) ** 2 + (ys[i1] - ys[i2]) ** 2)
            n += 1
    if n < min_points or n == 0:
        return nodata
    return acc / n


@pytest.mark.parametrize("kw", [
    dict(radius=3.0, min_points=0),
    dict(radius=4.0, radius2=2.0, angle=25.0, min_points=10),
])
def test_average_distance_pts_matches_scalar(spark, kw):
    xs, ys, zs = _pts(120, seed=11)
    pts = spark.createDataFrame(pd.DataFrame({"x": xs, "y": ys, "z": zs}))
    g = grid_points(pts, SPEC16, algo="average_distance_pts", nodata=-9.0, **kw)
    arr = materialize_full(g, SPEC16)
    exp = _grid_expected(
        xs, ys, zs, SPEC16,
        lambda x, y, z, cx, cy: _scalar_avg_dist_pts(
            x, y, z, cx, cy, kw["radius"], kw.get("radius2", kw["radius"]),
            kw.get("angle", 0.0), kw["min_points"], -9.0))
    np.testing.assert_allclose(arr, exp, rtol=0, atol=1e-9)


def test_average_distance_pts_blocked_path_matches(spark, monkeypatch):
    # force the row-blocked D @ M accumulation by dropping the matrix
    # limit below npts, and require bitwise-equal output to the full
    # (npts, npts) path
    import gdal_spark.operators.grid as gridmod

    xs, ys, zs = _pts(60, seed=5)
    pts = spark.createDataFrame(pd.DataFrame({"x": xs, "y": ys, "z": zs}))
    dense = grid_points(pts, SPEC16, algo="average_distance_pts", radius=5.0, nodata=-1.0)
    arr_dense = materialize_full(dense, SPEC16)
    monkeypatch.setattr(gridmod, "_PAIR_MATRIX_MAX_PTS", 8)
    blocked = grid_points(pts, SPEC16, algo="average_distance_pts", radius=5.0, nodata=-1.0)
    arr_blocked = materialize_full(blocked, SPEC16)
    np.testing.assert_allclose(arr_blocked, arr_dense, rtol=0, atol=1e-12)
    assert (arr_dense != -1.0).any()
