"""gdalmove — rewrite a raster's geotransform into a new CRS by
transforming control points, without touching pixels.

Reference: /root/reference/swig/python/gdal-utils/osgeo_utils/
gdalmove.py:36-200 (move): the four corners and the center transform
through s_srs -> t_srs; the new geotransform is the exact affine
through UL/UR/LL (:103-115 — deliberately NOT a least-squares fit over
all five, per the reference's own comment); the report evaluates, for
every control point, the adjusted geo position, the geo error vs the
true transformed point, and the pixel/line error through the inverted
new geotransform (gdal.InvGeoTransform == GDALInvGeoTransform,
alg/gdaltransformer.cpp:3516-3567 — the special no-rotation path and
the multiply-by-1/det adjoint path are both replicated bit-for-bit).
`pixel_threshold` gates the metadata update on max abs pixel error.

This is metadata math (seven doubles) — driver-side by construction;
the transformed raster itself never moves, which is the point of the
utility. The report doubles feed a DataFrame so the driver oracle can
replay every float op.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


def inv_geotransform(gt: tuple[float, ...]) -> tuple[float, ...] | None:
    """GDALInvGeoTransform (alg/gdaltransformer.cpp:3516-3567)."""
    if gt[2] == 0.0 and gt[4] == 0.0 and gt[1] != 0.0 and gt[5] != 0.0:
        return (
            -gt[0] / gt[1], 1.0 / gt[1], 0.0,
            -gt[3] / gt[5], 0.0, 1.0 / gt[5],
        )
    det = gt[1] * gt[5] - gt[2] * gt[4]
    magnitude = max(abs(gt[1]), abs(gt[2]), abs(gt[4]), abs(gt[5]))
    if abs(det) <= 1e-10 * magnitude * magnitude:
        return None
    inv_det = 1.0 / det
    return (
        (gt[2] * gt[3] - gt[0] * gt[5]) * inv_det,
        gt[5] * inv_det,
        -gt[2] * inv_det,
        (-gt[1] * gt[3] + gt[0] * gt[4]) * inv_det,
        -gt[4] * inv_det,
        gt[1] * inv_det,
    )


def _apply(gt, x, y):
    return gt[0] + x * gt[1] + y * gt[2], gt[3] + x * gt[4] + y * gt[5]


@dataclass(frozen=True)
class MoveReport:
    corner_id: int  # 0 UL, 1 LL, 2 UR, 3 LR, 4 center
    adj_x: float
    adj_y: float
    err_x: float
    err_y: float
    err_px: float
    err_py: float


def move_geotransform(
    width: int,
    height: int,
    gt: tuple[float, ...],
    transform_fn,
    pixel_threshold: float | None = None,
) -> tuple[tuple[float, ...], list[MoveReport], bool]:
    """transform_fn(x_list, y_list) -> (tx_list, ty_list) in the
    target SRS. Returns (new_gt, per-control-point report, updated?)
    — updated is False when pixel_threshold is set and exceeded
    (gdalmove.py:188-200)."""
    pts = [
        (0.0, 0.0),
        (0.0, float(height)),
        (float(width), 0.0),
        (float(width), float(height)),
        (width / 2.0, height / 2.0),
    ]
    s_geo = [_apply(gt, px, py) for px, py in pts]
    tx, ty = transform_fn([p[0] for p in s_geo], [p[1] for p in s_geo])
    t_geo = list(zip([float(v) for v in tx], [float(v) for v in ty]))
    ul, ll, ur = t_geo[0], t_geo[1], t_geo[2]
    new_gt = (
        ul[0],
        (ur[0] - ul[0]) / width,
        (ll[0] - ul[0]) / height,
        ul[1],
        (ur[1] - ul[1]) / width,
        (ll[1] - ul[1]) / height,
    )
    inv = inv_geotransform(new_gt)
    if inv is None:
        raise ValueError("new geotransform is not invertible")
    report = []
    max_err = 0.0
    for i, (px, py) in enumerate(pts):
        ax, ay = _apply(new_gt, px, py)
        ex, ey = ax - t_geo[i][0], ay - t_geo[i][1]
        npx, npy = _apply(inv, t_geo[i][0], t_geo[i][1])
        epx, epy = npx - px, npy - py
        max_err = max(max_err, abs(epx), abs(epy))
        report.append(MoveReport(i, ax, ay, ex, ey, epx, epy))
    updated = pixel_threshold is None or max_err <= pixel_threshold
    return new_gt, report, updated
