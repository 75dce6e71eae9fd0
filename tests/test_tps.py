"""Thin-plate-spline transformer (alg/thinplatespline.cpp,
alg/gdal_tps.cpp) — scalar replica parity for the FULL path, the
degenerate 1/2-point and collinear-1D paths, GCP interpolation, and
the affine-reduction property."""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.geom.tps import TPSSpline, TPSTransformer, TPSPipeline


def _ref_base(x1, y1, x2, y2):
    d2 = (x2 - x1) ** 2 + (y2 - y1) ** 2
    return d2 * math.log(d2) if d2 != 0.0 else 0.0


def _ref_full_solve_eval(px, py, t, qx, qy):
    """Scalar replica of VizGeorefSpline2D solve(FULL) + get_point."""
    n = len(px)
    xm, ym = np.mean(px), np.mean(py)
    cx, cy = np.asarray(px) - xm, np.asarray(py) - ym
    a = np.zeros((n + 3, n + 3))
    for c in range(n):
        a[0, c + 3] = 1.0
        a[1, c + 3] = cx[c]
        a[2, c + 3] = cy[c]
        a[c + 3, 0] = 1.0
        a[c + 3, 1] = cx[c]
        a[c + 3, 2] = cy[c]
        for r in range(c, n):
            a[r + 3, c + 3] = a[c + 3, r + 3] = _ref_base(cx[r], cy[r], cx[c], cy[c])
    rhs = np.zeros(n + 3)
    rhs[3:] = t
    coef = np.linalg.solve(a, rhs)
    out = []
    for X, Y in zip(qx, qy):
        pxy = (X - xm, Y - ym)
        v = coef[0] + coef[1] * pxy[0] + coef[2] * pxy[1]
        for r in range(n):
            v += coef[r + 3] * _ref_base(pxy[0], pxy[1], cx[r], cy[r])
        out.append(v)
    return np.asarray(out)


def test_full_matches_scalar_replica():
    rng = np.random.RandomState(11)
    px = rng.uniform(0, 200, 15)
    py = rng.uniform(0, 100, 15)
    t = rng.uniform(-50, 50, 15)
    qx = rng.uniform(-20, 220, 40)
    qy = rng.uniform(-20, 120, 40)
    sp = TPSSpline(px, py, t)
    assert sp.type == "full"
    got = sp.get_points(qx, qy)[:, 0]
    ref = _ref_full_solve_eval(px, py, t, qx, qy)
    assert np.allclose(got, ref, rtol=1e-10, atol=1e-8)


def test_interpolates_gcps_exactly():
    rng = np.random.RandomState(5)
    px = rng.uniform(0, 100, 10)
    py = rng.uniform(0, 100, 10)
    gx = 2 * px + 0.5 * py + rng.uniform(-5, 5, 10)
    gy = -px + 3 * py + rng.uniform(-5, 5, 10)
    tr = TPSTransformer(list(zip(px, py, gx, gy)))
    fx, fy = tr.forward(px, py)
    assert np.allclose(fx, gx, atol=1e-9) and np.allclose(fy, gy, atol=1e-9)
    bx, by = tr.inverse(gx, gy)
    assert np.allclose(bx, px, atol=1e-9) and np.allclose(by, py, atol=1e-9)


def test_affine_consistent_gcps_reduce_to_affine():
    pts = np.array([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0], [100.0, 100.0], [37.0, 61.0]])
    gx = 2 * pts[:, 0] + 10
    gy = -3 * pts[:, 1] + 50
    tr = TPSTransformer(list(zip(pts[:, 0], pts[:, 1], gx, gy)))
    qx = np.array([13.0, 55.5, 99.0])
    qy = np.array([77.0, 2.25, 44.0])
    fx, fy = tr.forward(qx, qy)
    assert np.allclose(fx, 2 * qx + 10, atol=1e-8)
    assert np.allclose(fy, -3 * qy + 50, atol=1e-8)


def test_one_and_two_point_paths():
    one = TPSSpline([5.0], [6.0], np.array([[70.0, 80.0]]))
    assert one.type == "one"
    assert np.allclose(one.get_points(np.array([0.0, 9.0]), np.array([0.0, 9.0])),
                       [[70.0, 80.0], [70.0, 80.0]])
    two = TPSSpline([0.0, 10.0], [0.0, 0.0], np.array([[100.0], [200.0]]))
    assert two.type == "two"
    # fact is the projection parameter: midpoint -> mean, beyond -> extrapolated
    got = two.get_points(np.array([5.0, 20.0, -10.0]), np.array([3.0, 0.0, 0.0]))
    assert np.allclose(got[:, 0], [150.0, 300.0, 0.0])


def test_exactly_axis_collinear_is_degenerate():
    # SSxx * SSyy == 0 precedes the 1D check in the reference (:490)
    with pytest.raises(ValueError):
        TPSSpline(np.array([0.0, 10.0, 20.0]), np.zeros(3), np.arange(3.0))


def test_near_collinear_points_take_1d_path():
    px = np.array([0.0, 10.0, 20.0, 30.0])
    py = np.array([0.0, 0.001, 0.003, 0.002])  # dely << 0.001 * delx
    t = np.array([1.0, 31.0, 61.0, 91.0])
    sp = TPSSpline(px, py, t)
    assert sp.type == "1d"
    qx = np.array([5.0, 25.0, 40.0, -10.0])
    qy = np.zeros(4)
    got = sp.get_points(qx, qy)[:, 0]
    # scalar replica of the 1D path (:499-531, :645-668)
    n = len(px)
    dx = n * (px * px).sum() - px.sum() ** 2
    dy = n * (py * py).sum() - py.sum() ** 2
    f = 1.0 / math.hypot(dx, dy)
    dx, dy = dx * f, dy * f
    u = dx * (px - px[0]) + dy * (py - py[0])
    order = np.argsort(u)
    exp = []
    for X, Y in zip(qx, qy):
        pu = dx * (X - px[0]) + dy * (Y - py[0])
        if pu <= u[order[0]]:
            lp, rp = order[0], order[1]
        elif pu >= u[order[-1]]:
            lp, rp = order[-2], order[-1]
        else:
            for r in range(1, n):
                lp, rp = order[r - 1], order[r]
                if u[lp] <= pu <= u[rp]:
                    break
        fact = (pu - u[lp]) / (u[rp] - u[lp])
        exp.append((1 - fact) * t[lp] + fact * t[rp])
    assert np.allclose(got, exp)


def test_chunked_eval_equals_direct():
    import gdal_spark.geom.tps as tps

    rng = np.random.RandomState(2)
    px = rng.uniform(0, 50, 30)
    py = rng.uniform(0, 50, 30)
    t = rng.uniform(0, 10, 30)
    sp = TPSSpline(px, py, t)
    qx, qy = rng.uniform(0, 50, 25), rng.uniform(0, 50, 25)
    direct = sp.get_points(qx, qy)
    old = tps._GCP_CHUNK
    tps._GCP_CHUNK = 4
    try:
        chunked = sp.get_points(qx, qy)
    finally:
        tps._GCP_CHUNK = old
    assert np.allclose(chunked, direct)


def test_pipeline_composes_geo_step():
    class Scale2:
        def forward(self, x, y):
            return np.asarray(x) * 2, np.asarray(y) * 2

        def inverse(self, x, y):
            return np.asarray(x) / 2, np.asarray(y) / 2

    pts = [(0.0, 0.0, 0.0, 0.0), (10.0, 0.0, 10.0, 0.0), (0.0, 10.0, 0.0, 10.0),
           (10.0, 10.0, 10.0, 10.0), (3.0, 7.0, 3.0, 7.0)]
    p = TPSPipeline(pts, geo_pipeline=Scale2())
    fx, fy = p.forward(np.array([4.0]), np.array([6.0]))
    assert fx[0] == pytest.approx(8.0) and fy[0] == pytest.approx(12.0)
    bx, by = p.inverse(np.array([8.0]), np.array([12.0]))
    assert bx[0] == pytest.approx(4.0) and by[0] == pytest.approx(6.0)


def test_errors():
    with pytest.raises(ValueError):
        TPSTransformer([])
    with pytest.raises(ValueError):
        TPSSpline([1.0, 1.0], [2.0, 2.0], np.array([[1.0], [2.0]]))  # coincident
