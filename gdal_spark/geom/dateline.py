"""ogr2ogr -wrapdateline / -datelineoffset geometry helpers.

Reference: ogr/ogrgeometryfactory.cpp —
  WrapPointDateLine (:3401), SplitLineStringAtDateline (:3137),
  FixPolygonCoordinatesAtDateLine (:3255),
  CutGeometryOnDateLineAndAddToMulti (:3417).
The detection heuristics and border arithmetic are reproduced exactly
(left border = 180 - offset, right border = -180 + offset, "big diff"
threshold = 360 - offset, the pole-artifact exception, the bGoEast
state walk for polygon rings). The polygon cut itself runs through
this engine's overlay kernel instead of GEOS.
"""

from __future__ import annotations

import numpy as np


def wrap_point_lon(x: float) -> float:
    """WrapPointDateLine: normalize a single longitude into
    [-180, 180] (ogrgeometryfactory.cpp:3401-3410)."""
    if x > 180:
        return ((x + 180) % 360) - 180
    if x < -180:
        return -(((-x + 180) % 360) - 180)
    return x


def detect_crossing(
    rings: list[np.ndarray], offset: float
) -> tuple[str | None, bool]:
    """-> (branch, around_minus180) per the reference's heuristics
    (:3435-3516). branch: "rect" = the envelope test fired (cut via
    rectangle intersection, the GEOS path); "bigdiff" = the vertex
    big-jump scan fired (lines split at the dateline, polygons get the
    coordinate fix then the rectangle cut); None = no crossing.
    `rings` is the geometry's coordinate runs; the big-diff scan walks
    the exterior ring / linestring (rings[0]) only, like the
    reference."""
    xs = np.concatenate([r[:, 0] for r in rings if len(r)]) if rings else np.empty(0)
    if xs.size == 0:
        return None, False
    minx, maxx = float(xs.min()), float(xs.max())
    around_minus180 = minx < -180.0
    left = 180.0 - offset
    right = -180.0 + offset
    diff_space = 360.0 - offset
    xoff = 360.0 if around_minus180 else 0.0
    if minx < -180 or maxx > 180 or (minx + xoff > left and maxx + xoff > 180):
        return "rect", around_minus180
    ls = rings[0]
    max_small = 0.0
    has_big = False
    for i in range(1, len(ls)):
        px, x = ls[i - 1, 0] + xoff, ls[i, 0] + xoff
        d = abs(x - px)
        if d > diff_space and ((x > left and px < right) or (px > left and x < right)):
            # pole artifact: a 360-jump at |lat| ~ 90 is not a crossing
            if not (abs(d - 360) < 1e-5 and abs(abs(ls[i, 1]) - 90) < 1e-5):
                has_big = True
        elif d > max_small:
            max_small = d
    if has_big and max_small < offset:
        return "bigdiff", around_minus180
    return None, around_minus180


def split_linestring(
    coords: np.ndarray, offset: float, xoff: float
) -> list[np.ndarray]:
    """SplitLineStringAtDateline (:3137-3248): walk the vertices, cut
    each dateline-jumping segment at +-180 with linear interpolation,
    emit the resulting sub-linestrings."""
    left = 180.0 - offset
    right = -180.0 + offset
    diff_space = 360.0 - offset
    out: list[list[tuple[float, float]]] = [[]]
    n = len(coords)
    i = 0
    while i < n:
        x = coords[i, 0] + xoff
        y = coords[i, 1]
        if i > 0 and abs(x - (coords[i - 1, 0] + xoff)) > diff_space:
            x1, y1 = coords[i - 1, 0] + xoff, coords[i - 1, 1]
            x2, y2 = x, y
            # touch-and-return special cases: the segment lands exactly
            # on the dateline and comes back — no new sub-line
            if (
                -180 < x1 < right and x2 == 180 and i + 1 < n
                and -180 < coords[i + 1, 0] + xoff < right
            ):
                out[-1].append((-180.0, y))
                i += 1
                out[-1].append((coords[i, 0] + xoff, coords[i, 1]))
                i += 1
                continue
            if (
                left < x1 < 180 and x2 == -180 and i + 1 < n
                and left < coords[i + 1, 0] + xoff < 180
            ):
                out[-1].append((180.0, y))
                i += 1
                out[-1].append((coords[i, 0] + xoff, coords[i, 1]))
                i += 1
                continue
            # orient so x1 is the eastern-side endpoint (:3196-3206)
            if x1 < right and x2 > left:
                x1, x2 = x2, x1
                y1, y2 = y2, y1
            if x1 > left and x2 < right:
                x2 += 360
            if x1 <= 180 <= x2 and x1 < x2:
                ratio = (180 - x1) / (x2 - x1)
                yi = ratio * y2 + (1 - ratio) * y1
                new_x = 180.0 if coords[i - 1, 0] + xoff > left else -180.0
                if not out[-1] or out[-1][-1] != (new_x, yi):
                    out[-1].append((new_x, yi))
                out.append([(-new_x, yi)])
            else:
                out.append([])
        out[-1].append((x, y))
        i += 1
    return [np.asarray(seg, dtype=np.float64) for seg in out if len(seg) >= 2]


def fix_polygon_rings(rings: list[np.ndarray], offset: float) -> list[np.ndarray]:
    """FixPolygonCoordinatesAtDateLine (:3255-3310): make each ring's
    longitudes continuous across the dateline by shifting the western
    vertices +360 (the bGoEast state walk), so a plain rectangle
    intersection can cut the polygon."""
    left = 180.0 - offset
    right = -180.0 + offset
    diff_space = 360.0 - offset
    out = []
    for r in rings:
        ls = r.copy()
        go_east = False
        for i in range(1, len(ls)):
            x = ls[i, 0]
            prev_x = ls[i - 1, 0]
            if abs(x - prev_x) > diff_space:
                if (prev_x > left and x < right) or (x < 0 and go_east):
                    ls[i, 0] = x + 360
                    go_east = True
                elif prev_x < right and x > left:
                    back = ls[: i, 0]
                    back[back < 0] += 360
                    go_east = False
                else:
                    go_east = False
        out.append(ls)
    return out
