"""Thin-plate-spline GCP transformer.

Reference: GDALCreateTPSTransformer / GDALTPSTransform
(/root/reference/alg/gdal_tps.cpp:154-227,409-436) over
VizGeorefSpline2D (/root/reference/alg/thinplatespline.cpp) — two
independent 2-var splines, forward (pixel/line -> geo) and reverse
(geo -> pixel/line), each solved once from the GCPs.

Spline semantics replicated from thinplatespline.cpp:
  - basis: base_func(P, Q) = d2 * ln(d2) with d2 the SQUARED distance,
    0 at coincident points (:180-181)
  - solve() type dispatch (:424-537): 0 points -> zeros; 1 point ->
    constant; 2 points -> linear along the segment (normalized by
    |d|^2 so `fact` is the projection parameter); >= 3 near-collinear
    points (delx < 0.001*dely or dely < 0.001*delx or correlation^2 >
    0.99) -> 1-D piecewise-linear along the regression direction
    (_dx,_dy) ~ (n*Sxx - Sx^2, n*Syy - Sy^2) normalized, with
    EXTRAPOLATION from the terminal segments; general -> FULL TPS,
    points mean-centered, symmetric (n+3)x(n+3) system with the affine
    block [1, x, y] and K[r,c] = base_func, one RHS per output var
  - get_point() (:622-697): FULL evaluates affine + sum of
    coef[r+3] * base_func(P - mean, point_r)

The solve runs on the driver (the reference holds the same dense
system in memory; GCP counts are thousands at most) and the fitted
coefficient vector rides into executors as a closure broadcast;
evaluation is vectorized numpy over Arrow batches — distance matrix
in GCP chunks, so memory is O(chunk x batch) for huge GCP sets.
"""

from __future__ import annotations

import numpy as np

_GCP_CHUNK = 2048


def _base(d2: np.ndarray) -> np.ndarray:
    """d2 * ln(d2), defined 0 at d2 == 0 (thinplatespline.cpp:180)."""
    out = np.zeros_like(d2)
    nz = d2 > 0
    out[nz] = d2[nz] * np.log(d2[nz])
    return out


class TPSSpline:
    """VizGeorefSpline2D with nof_vars target columns."""

    def __init__(self, px: np.ndarray, py: np.ndarray, targets: np.ndarray):
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        t = np.asarray(targets, dtype=np.float64)
        if t.ndim == 1:
            t = t[:, None]
        n = px.size
        self.n = n
        self.px, self.py, self.t = px, py, t
        if n == 0:
            self.type = "zero"
            return
        if n == 1:
            self.type = "one"
            return
        if n == 2:
            dx, dy = px[1] - px[0], py[1] - py[0]
            denom = dx * dx + dy * dy
            if denom == 0.0:
                raise ValueError("coincident points")
            self.type = "two"
            self._dx, self._dy = dx / denom, dy / denom
            return
        delx = px.max() - px.min()
        dely = py.max() - py.min()
        sumx, sumy = px.sum(), py.sum()
        sumx2, sumy2, sumxy = (px * px).sum(), (py * py).sum(), (px * py).sum()
        ssxx = sumx2 - sumx * sumx / n
        ssyy = sumy2 - sumy * sumy / n
        ssxy = sumxy - sumx * sumy / n
        if ssxx * ssyy == 0.0:
            raise ValueError("Degenerate system.")
        if delx < 0.001 * dely or dely < 0.001 * delx or abs(ssxy * ssxy / (ssxx * ssyy)) > 0.99:
            self.type = "1d"
            dx = n * sumx2 - sumx * sumx
            dy = n * sumy2 - sumy * sumy
            fact = 1.0 / np.hypot(dx, dy)
            self._dx, self._dy = dx * fact, dy * fact
            self._u = self._dx * (px - px[0]) + self._dy * (py - py[0])
            self._order = np.argsort(self._u, kind="stable")
            return
        self.type = "full"
        self.x_mean, self.y_mean = px.mean(), py.mean()
        cx, cy = px - self.x_mean, py - self.y_mean
        self._cx, self._cy = cx, cy
        neq = n + 3
        a = np.zeros((neq, neq))
        a[0, 3:] = 1.0
        a[1, 3:] = cx
        a[2, 3:] = cy
        a[3:, 0] = 1.0
        a[3:, 1] = cx
        a[3:, 2] = cy
        d2 = (cx[:, None] - cx[None, :]) ** 2 + (cy[:, None] - cy[None, :]) ** 2
        a[3:, 3:] = _base(d2)
        rhs = np.zeros((neq, t.shape[1]))
        rhs[3:, :] = t
        self.coef = np.linalg.solve(a, rhs)  # (n+3, nvars)

    def get_points(self, qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
        """Vectorized get_point: (N, nvars)."""
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        nvars = self.t.shape[1] if self.n else 1
        if self.type == "zero":
            return np.zeros((qx.size, nvars))
        if self.type == "one":
            return np.broadcast_to(self.t[0], (qx.size, nvars)).copy()
        if self.type == "two":
            fact = self._dx * (qx - self.px[0]) + self._dy * (qy - self.py[0])
            return (1 - fact)[:, None] * self.t[0] + fact[:, None] * self.t[1]
        if self.type == "1d":
            pu = self._dx * (qx - self.px[0]) + self._dy * (qy - self.py[0])
            us = self._u[self._order]
            # segment choice incl. terminal extrapolation (:645-668)
            seg = np.clip(np.searchsorted(us, pu, side="left"), 1, self.n - 1)
            left, right = self._order[seg - 1], self._order[seg]
            fact = (pu - self._u[left]) / (self._u[right] - self._u[left])
            return (1 - fact)[:, None] * self.t[left] + fact[:, None] * self.t[right]
        out = (
            self.coef[0][None, :]
            + (qx - self.x_mean)[:, None] * self.coef[1][None, :]
            + (qy - self.y_mean)[:, None] * self.coef[2][None, :]
        )
        cqx, cqy = qx - self.x_mean, qy - self.y_mean
        for s in range(0, self.n, _GCP_CHUNK):
            e = min(s + _GCP_CHUNK, self.n)
            d2 = (cqx[:, None] - self._cx[None, s:e]) ** 2 + (cqy[:, None] - self._cy[None, s:e]) ** 2
            out += _base(d2) @ self.coef[3 + s : 3 + e]
        return out


class TPSTransformer:
    """GDALCreateTPSTransformer: gcps = iterable of (pixel, line,
    geo_x, geo_y); forward/inverse follow the GCPTransformer Pipeline
    interface so TPS plugs into the same warp/tile path."""

    def __init__(self, gcps):
        g = np.asarray([(p, l, x, y) for p, l, x, y in gcps], dtype=np.float64)
        if len(g) == 0:
            raise ValueError("TPS needs at least 1 GCP")
        px, ln, gx, gy = g.T
        self._fwd = TPSSpline(px, ln, np.column_stack([gx, gy]))
        self._inv = TPSSpline(gx, gy, np.column_stack([px, ln]))

    def forward(self, px, py):
        """pixel/line -> geo (gdal_tps.cpp:436 poForward)."""
        out = self._fwd.get_points(px, py)
        return out[:, 0], out[:, 1]

    def inverse(self, x, y):
        """geo -> pixel/line (gdal_tps.cpp:409 poReverse)."""
        out = self._inv.get_points(x, y)
        return out[:, 0], out[:, 1]


class TPSPipeline:
    """Composes dst-projection <-> geo <-> src-pixel for the warp path
    exactly like GCPPipeline (geom/gcp.py:80), with TPS in place of the
    polynomial: forward = src pixel -> dst world, inverse = dst world
    -> src pixel."""

    def __init__(self, gcps, geo_pipeline=None):
        self.tps = TPSTransformer(gcps)
        self.geo = geo_pipeline

    def forward(self, px, py):
        x, y = self.tps.forward(px, py)
        return self.geo.forward(x, y) if self.geo is not None else (x, y)

    def inverse(self, X, Y):
        if self.geo is not None:
            X, Y = self.geo.inverse(X, Y)
        return self.tps.inverse(X, Y)
