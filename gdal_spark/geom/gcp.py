"""GCP polynomial transformer (order 1-3).

Reference: GDALCreateGCPTransformer / GDALGCPTransform
(/root/reference/alg/gdal_crs.cpp): least-squares bivariate
polynomials of order 1-3 fitted BOTH directions between pixel/line
space (x1, y1) and georeferenced space (x2, y2), each fit and
evaluation mean-centered (gdal_crs.cpp:286-289, 451-458). The
polynomial term layout matches CRS_georef (gdal_crs.cpp:608):
  order 1: 1, e, n
  order 2: + e^2, e*n, n^2
  order 3: + e^3, e^2 n, e n^2, n^3
The reference solves the normal equations (calcls); we use numpy
lstsq on the same design matrix — identical minimizer up to fp
conditioning (mean-centering keeps both well-conditioned).

Exposes the Pipeline interface (forward/inverse over numpy arrays) so
a GCP-georeferenced source plugs straight into the warp/tile path:
give the source RasterSpec an identity geotransform and use this as
its pipeline (src "world" == src pixel).
"""

from __future__ import annotations

import numpy as np

_N_TERMS = {1: 3, 2: 6, 3: 10}


def _terms(e: np.ndarray, n: np.ndarray, order: int) -> np.ndarray:
    """Design-matrix columns in CRS_georef order."""
    cols = [np.ones_like(e), e, n]
    if order >= 2:
        cols += [e * e, e * n, n * n]
    if order >= 3:
        cols += [e * e * e, e * e * n, e * n * n, n * n * n]
    return np.column_stack(cols)


class GCPTransformer:
    """gcps: iterable of (pixel, line, geo_x, geo_y)."""

    def __init__(self, gcps, order: int = 1):
        if order not in _N_TERMS:
            raise ValueError(f"order must be 1..3, got {order}")
        g = np.asarray([(p, l, x, y) for p, l, x, y in gcps], dtype=np.float64)
        need = _N_TERMS[order]
        if len(g) < need:
            raise ValueError(f"order {order} needs >= {need} GCPs, got {len(g)}")
        self.order = order
        px, ln, gx, gy = g.T
        self.x1_mean, self.y1_mean = px.mean(), ln.mean()
        self.x2_mean, self.y2_mean = gx.mean(), gy.mean()
        a_fwd = _terms(px - self.x1_mean, ln - self.y1_mean, order)
        self.E12, *_ = np.linalg.lstsq(a_fwd, gx, rcond=None)
        self.N12, *_ = np.linalg.lstsq(a_fwd, gy, rcond=None)
        a_inv = _terms(gx - self.x2_mean, gy - self.y2_mean, order)
        self.E21, *_ = np.linalg.lstsq(a_inv, px, rcond=None)
        self.N21, *_ = np.linalg.lstsq(a_inv, ln, rcond=None)

    def forward(self, px, py):
        """pixel/line -> geo (GDALGCPTransform bDstToSrc=FALSE)."""
        t = _terms(
            np.asarray(px, dtype=np.float64) - self.x1_mean,
            np.asarray(py, dtype=np.float64) - self.y1_mean,
            self.order,
        )
        return t @ self.E12, t @ self.N12

    def inverse(self, x, y):
        """geo -> pixel/line (bDstToSrc=TRUE; separate fitted
        polynomial, like the reference — not an iterative inversion)."""
        t = _terms(
            np.asarray(x, dtype=np.float64) - self.x2_mean,
            np.asarray(y, dtype=np.float64) - self.y2_mean,
            self.order,
        )
        return t @ self.E21, t @ self.N21


class GCPPipeline:
    """Composes dst-projection <-> geo <-> src-pixel for the warp
    path: forward = src pixel -> dst world, inverse = dst world ->
    src pixel. Use with a src RasterSpec whose geotransform is the
    identity (world == pixel on the source side)."""

    def __init__(self, gcps, order: int = 1, geo_pipeline=None):
        self.gcp = GCPTransformer(gcps, order)
        self.geo = geo_pipeline  # optional geo <-> dst-projection step

    def forward(self, px, py):
        x, y = self.gcp.forward(px, py)
        return self.geo.forward(x, y) if self.geo is not None else (x, y)

    def inverse(self, X, Y):
        if self.geo is not None:
            X, Y = self.geo.inverse(X, Y)
        return self.gcp.inverse(X, Y)


_FLT_EPSILON = 1.19209290e-07


def refine_gcps(
    gcps,
    order: int = 1,
    tolerance: float = 1.0,
    minimum_gcps: int | None = None,
) -> tuple[list[int], GCPTransformer]:
    """gdal_translate -refine_gcps / GDALCreateGCPRefineTransformer
    (alg/gdal_crs.cpp:1097-1219 remove_outliers + :1039-1081
    worst_outlier): iteratively drop the single worst GCP whose
    forward-transform residual (euclidean, values under FLT_EPSILON
    clamped to 0, :1068-1071) is >= tolerance, refit, and stop when
    none qualifies or only minimum_gcps remain. The centering means
    are computed ONCE from the ORIGINAL set and reused by every refit
    (:1142-1146 — psInfo means are never recomputed), which this
    replicates via the fixed_means fit.

    Returns (kept original indices, the refined transformer). GCP
    lists are driver-sized by construction (the reference holds them
    in memory too); the refined transformer then feeds the distributed
    warp/tile path like any GCPPipeline."""
    g = np.asarray([(p, l, x, y) for p, l, x, y in gcps], dtype=np.float64)
    n = len(g)
    need = _N_TERMS[order]
    if minimum_gcps is None:
        minimum_gcps = need + 1
    px, ln, gx, gy = g.T
    x1m, y1m = px.mean(), ln.mean()

    keep = list(range(n))

    def _fit(idx):
        a = _terms(px[idx] - x1m, ln[idx] - y1m, order)
        E, *_ = np.linalg.lstsq(a, gx[idx], rcond=None)
        N, *_ = np.linalg.lstsq(a, gy[idx], rcond=None)
        return E, N

    E, N = _fit(keep)
    while len(keep) > minimum_gcps:
        t = _terms(px[keep] - x1m, ln[keep] - y1m, order)
        res = np.hypot(t @ E - gx[keep], t @ N - gy[keep])
        res = np.where(res < _FLT_EPSILON, 0.0, res)
        worst = -1
        diff = -1.0
        for i, r in enumerate(res):
            if r > diff and r >= tolerance:
                diff = r
                worst = i
        if worst == -1:
            break
        del keep[worst]
        E, N = _fit(keep)

    refined = GCPTransformer([tuple(g[i]) for i in keep], order=order)
    # reference refits around the ORIGINAL means (psInfo never updates
    # them): override both directions accordingly
    refined.x1_mean, refined.y1_mean = x1m, y1m
    refined.E12, refined.N12 = E, N
    x2m, y2m = gx.mean(), gy.mean()
    a_inv = _terms(gx[keep] - x2m, gy[keep] - y2m, order)
    refined.x2_mean, refined.y2_mean = x2m, y2m
    refined.E21, *_ = np.linalg.lstsq(a_inv, px[keep], rcond=None)
    refined.N21, *_ = np.linalg.lstsq(a_inv, ln[keep], rcond=None)
    return keep, refined
