"""Homography (projective) transformer.

Reference: /root/reference/alg/gdal_homography.cpp —
GDALGCPsToHomography (:142-330), GDALComposeHomographies (:334-375),
GDALApplyHomography (:377-424), GDALInvHomography (:426-501),
GDALHomographyTransform (:529+). Coefficient layout follows the
reference's geotransform-like convention:

    w  = h[6] + px*h[7] + py*h[8]
    X  = (h[0] + px*h[1] + py*h[2]) / w
    Y  = (h[3] + px*h[4] + py*h[5]) / w

The fit is the reference's normalized DLT: pixel/line and geo spaces
are each affinely mapped to the unit square, the 9x9 normal-equations
system (rank 8 + the h_n[6]=1 pinning row, gdal_homography.cpp:233-239)
is solved, the unit-square image is checked convex via the two cross
products (:288-318), and the result is composed with the normalization
homographies. With <4 GCPs the reference defers to
GDALGCPsToGeoTransform; we fit the exact/least-squares affine and embed
it (w == 1).
"""

from __future__ import annotations

import numpy as np


def apply_homography(h, px, py):
    """Vectorized GDALApplyHomography (gdal_homography.cpp:377-424).
    Returns (X, Y); raises on |w| < 1e-15 anywhere (the reference
    returns FALSE per point)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    w = h[6] + px * h[7] + py * h[8]
    if np.any(np.abs(w) < 1.0e-15):
        raise ValueError("homography: |w| < 1e-15 (point at infinity)")
    return (h[0] + px * h[1] + py * h[2]) / w, (h[3] + px * h[4] + py * h[5]) / w


def compose_homographies(h1, h2):
    """GDALComposeHomographies (gdal_homography.cpp:334-375): result
    applies h1 then h2."""
    o = np.empty(9, dtype=np.float64)
    o[1] = h2[1] * h1[1] + h2[2] * h1[4] + h2[0] * h1[7]
    o[2] = h2[1] * h1[2] + h2[2] * h1[5] + h2[0] * h1[8]
    o[0] = h2[1] * h1[0] + h2[2] * h1[3] + h2[0] * h1[6]
    o[4] = h2[4] * h1[1] + h2[5] * h1[4] + h2[3] * h1[7]
    o[5] = h2[4] * h1[2] + h2[5] * h1[5] + h2[3] * h1[8]
    o[3] = h2[4] * h1[0] + h2[5] * h1[3] + h2[3] * h1[6]
    o[7] = h2[7] * h1[1] + h2[8] * h1[4] + h2[6] * h1[7]
    o[8] = h2[7] * h1[2] + h2[8] * h1[5] + h2[6] * h1[8]
    o[6] = h2[7] * h1[0] + h2[8] * h1[3] + h2[6] * h1[6]
    return o


def inv_homography(h):
    """GDALInvHomography (gdal_homography.cpp:426-501): the
    no-rotation special case, then the adjoint/determinant path.
    Returns None when the determinant is (relatively) null."""
    h = np.asarray(h, dtype=np.float64)
    if (
        h[2] == 0.0
        and h[4] == 0.0
        and h[1] != 0.0
        and h[5] != 0.0
        and h[7] == 0.0
        and h[8] == 0.0
        and h[6] != 0.0
    ):
        return np.array(
            [
                -h[0] / h[1] / h[6], 1.0 / h[1], 0.0,
                -h[3] / h[5] / h[6], 0.0, 1.0 / h[5],
                1.0 / h[6], 0.0, 0.0,
            ]
        )
    det = (
        h[1] * h[5] * h[6]
        - h[2] * h[4] * h[6]
        + h[2] * h[3] * h[7]
        - h[0] * h[5] * h[7]
        + h[0] * h[4] * h[8]
        - h[1] * h[3] * h[8]
    )
    magnitude = max(abs(h[1]), abs(h[2]), abs(h[4]), abs(h[5]))
    if abs(det) <= 1e-10 * magnitude * magnitude:
        return None
    inv_det = 1.0 / det
    o = np.empty(9, dtype=np.float64)
    o[1] = (h[5] * h[6] - h[3] * h[8]) * inv_det
    o[4] = (h[3] * h[7] - h[4] * h[6]) * inv_det
    o[7] = (h[4] * h[8] - h[5] * h[7]) * inv_det
    o[2] = (h[0] * h[8] - h[2] * h[6]) * inv_det
    o[5] = (h[1] * h[6] - h[0] * h[7]) * inv_det
    o[8] = (h[2] * h[7] - h[1] * h[8]) * inv_det
    o[0] = (h[2] * h[3] - h[0] * h[5]) * inv_det
    o[3] = (h[0] * h[4] - h[1] * h[3]) * inv_det
    o[6] = (h[1] * h[5] - h[2] * h[4]) * inv_det
    return o


def _affine_from_gcps(gcps):
    """GDALGCPsToGeoTransform analog for the <4-GCP fallback
    (gdal_homography.cpp:206-213): exact affine through <=3 points
    (least squares if over-determined), embedded with w == 1."""
    g = np.asarray(gcps, dtype=np.float64)
    a = np.column_stack([np.ones(len(g)), g[:, 0], g[:, 1]])
    cx, *_ = np.linalg.lstsq(a, g[:, 2], rcond=None)
    cy, *_ = np.linalg.lstsq(a, g[:, 3], rcond=None)
    h = np.zeros(9, dtype=np.float64)
    h[0:3] = cx
    h[3:6] = cy
    h[6] = 1.0
    return h


def gcps_to_homography(gcps):
    """GDALGCPsToHomography (gdal_homography.cpp:142-330).

    gcps: iterable of (pixel, line, geo_x, geo_y). Returns the
    9-coefficient forward homography; raises ValueError on the
    reference's failure modes (degenerate extent, singular system,
    pinning coefficient ~0, non-convex unit-square image).
    """
    g = np.asarray([(p, l, x, y) for p, l, x, y in gcps], dtype=np.float64)
    if len(g) < 4:
        return _affine_from_gcps(g)

    px, ln, gx, gy = g.T
    min_pixel, max_pixel = px.min(), px.max()
    min_line, max_line = ln.min(), ln.max()
    min_geox, max_geox = gx.min(), gx.max()
    min_geoy, max_geoy = gy.min(), gy.max()
    eps = 1.0e-12
    if (
        abs(max_pixel - min_pixel) < eps
        or abs(max_line - min_line) < eps
        or abs(max_geox - min_geox) < eps
        or abs(max_geoy - min_geoy) < eps
    ):
        raise ValueError("GCPs degenerate in at least one dimension")

    pl_norm = np.array(
        [
            -min_pixel / (max_pixel - min_pixel), 1.0 / (max_pixel - min_pixel), 0.0,
            -min_line / (max_line - min_line), 0.0, 1.0 / (max_line - min_line),
            1.0, 0.0, 0.0,
        ]
    )
    geo_norm = np.array(
        [
            -min_geox / (max_geox - min_geox), 1.0 / (max_geox - min_geox), 0.0,
            -min_geoy / (max_geoy - min_geoy), 0.0, 1.0 / (max_geoy - min_geoy),
            1.0, 0.0, 0.0,
        ]
    )
    inv_geo_norm = inv_homography(geo_norm)
    if inv_geo_norm is None:
        raise ValueError("geo normalization not invertible")

    # Normal equations over the normalized DLT rows, with the
    # h_n[6] = 1 pinning equation (gdal_homography.cpp:233-239).
    pixel, line = apply_homography(pl_norm, px, ln)
    geox, geoy = apply_homography(geo_norm, gx, gy)
    zeros = np.zeros_like(pixel)
    ones = np.ones_like(pixel)
    ax = np.column_stack(
        [ones, pixel, line, zeros, zeros, zeros,
         -geox, -geox * pixel, -geox * line]
    )
    ay = np.column_stack(
        [zeros, zeros, zeros, ones, pixel, line,
         -geoy, -geoy * pixel, -geoy * line]
    )
    ata = ax.T @ ax + ay.T @ ay
    rhs = np.zeros(9)
    rhs[6] = 1.0
    ata[6, 6] += 1.0
    try:
        h_n = np.linalg.solve(ata, rhs)
    except np.linalg.LinAlgError as exc:
        raise ValueError("homography normal equations singular") from exc
    if abs(h_n[6]) < 1.0e-15:
        raise ValueError("homography pinning coefficient ~0")

    # Convexity of the unit square's image (gdal_homography.cpp:288-318).
    cx, cy = apply_homography(
        h_n, np.array([0.0, 1.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0, 1.0])
    )
    vx, vy = cx - cx[0], cy - cy[0]
    cross12 = vx[1] * vy[2] - vx[2] * vy[1]
    cross23 = vx[2] * vy[3] - vx[3] * vy[2]
    if cross12 * cross23 <= 0.0:
        raise ValueError("homography maps unit square to non-convex quad")

    h1p2 = compose_homographies(pl_norm, h_n)
    return compose_homographies(h1p2, inv_geo_norm)


class HomographyTransformer:
    """GDALCreateHomographyTransformerFromGCPs + GDALHomographyTransform
    (gdal_homography.cpp:503-563): forward = pixel/line -> geo via the
    fitted homography, inverse = geo -> pixel/line via the EXACT
    analytic inverse (GDALInvHomography) — unlike the GCP polynomial
    transformer, the two directions are consistent by construction."""

    def __init__(self, gcps):
        self.forward_h = gcps_to_homography(gcps)
        rev = inv_homography(self.forward_h)
        if rev is None:
            raise ValueError("homography not invertible")
        self.reverse_h = rev

    def forward(self, px, py):
        return apply_homography(self.forward_h, px, py)

    def inverse(self, x, y):
        return apply_homography(self.reverse_h, x, y)
