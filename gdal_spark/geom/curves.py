"""Curve geometry linearization (CircularString / CompoundCurve /
CurvePolygon / MultiCurve / MultiSurface -> linear types).

Reference semantics: OGRGeometryFactory::curveToLineString
(/root/reference/ogr/ogrgeometryfactory.cpp:6071) with its helpers
GetCurveParameters (:5809 — circumcenter via normalized determinant,
1e-8 collinearity threshold, CCW-ordered angles) and
OGRGeometryFactoryStrokeArc (:5906 — constant angular step,
nSteps = int(|a1-a0|/step + 0.5) with a minimum of 4, direction-
independent spacing), default step 4 degrees (GetDefaultArcStepSize,
:4733). The start/end symmetry rule OGRGF_NeedSwithArcOrder (:6014)
is reproduced so the same arc stroked from either direction yields
binary-identical vertices. Deviation: the STEALTH hidden-bit encoding
of the intermediate point (used by the reference only to round-trip
curves back from linestrings) is not applied — we stroke with the
ADD_INTERMEDIATE_POINT=NO vertex layout.

A full circle (first == final point) strokes counter-clockwise from
the first point through the intermediate's antipode convention
(GetCurveParameters circle branch: center = midpoint(p0, p1)).
"""

from __future__ import annotations

import math

import numpy as np

DEFAULT_ARC_STEP_DEG = 4.0


def get_curve_parameters(x0, y0, x1, y1, x2, y2):
    """(ok, R, cx, cy, alpha0, alpha1, alpha2) — angles in radians,
    monotone from alpha0 to alpha2 (CCW positive)."""
    if any(math.isnan(v) for v in (x0, y0, x1, y1, x2, y2)):
        return False, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    if x0 == x2 and y0 == y2:  # full circle
        if x0 != x1 or y0 != y1:
            cx = (x0 + x1) / 2
            cy = (y0 + y1) / 2
            R = math.hypot(x0 - cx, y0 - cy)
            a0 = math.atan2(y0 - cy, x0 - cx)
            return True, R, cx, cy, a0, a0 + math.pi, a0 + 2 * math.pi
        return False, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    dx01, dy01 = x1 - x0, y1 - y0
    dx12, dy12 = x2 - x1, y2 - y1
    scale = max(abs(dx01), abs(dy01), abs(dx12), abs(dy12))
    inv = 1.0 / scale
    dx01 *= inv
    dy01 *= inv
    dx12 *= inv
    dy12 *= inv
    det = dx01 * dy12 - dx12 * dy01
    if abs(det) < 1.0e-8 or math.isnan(det):
        return False, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    x01m, x12m = (x0 + x1) * inv, (x1 + x2) * inv
    y01m, y12m = (y0 + y1) * inv, (y1 + y2) * inv
    c01 = dx01 * x01m + dy01 * y01m
    c12 = dx12 * x12m + dy12 * y12m
    cx = 0.5 * scale * (c01 * dy12 - c12 * dy01) / det
    cy = 0.5 * scale * (-c01 * dx12 + c12 * dx01) / det
    a0 = math.atan2((y0 - cy) * inv, (x0 - cx) * inv)
    a1 = math.atan2((y1 - cy) * inv, (x1 - cx) * inv)
    a2 = math.atan2((y2 - cy) * inv, (x2 - cx) * inv)
    R = math.hypot(x0 - cx, y0 - cy)
    if det < 0:  # clockwise
        if a1 > a0:
            a1 -= 2 * math.pi
        if a2 > a1:
            a2 -= 2 * math.pi
    else:
        if a1 < a0:
            a1 += 2 * math.pi
        if a2 < a1:
            a2 += 2 * math.pi
    return True, R, cx, cy, a0, a1, a2


def _stroke_arc(pts: list, cx, cy, R, a0, a1, step):
    """Append intermediate arc vertices (exclusive of both ends)."""
    nsign = 1 if step > 0 else -1
    nsteps = int(abs((a1 - a0) / step) + 0.5)
    if nsteps < 4:
        nsteps = 4
    step = nsign * abs((a1 - a0) / nsteps)
    alpha = a0 + step
    while (alpha - a1) * nsign < -1e-8:
        pts.append((cx + R * math.cos(alpha), cy + R * math.sin(alpha)))
        alpha += step


def curve_to_linestring(x0, y0, x1, y1, x2, y2, max_step_deg: float = 0.0) -> np.ndarray:
    """Stroke one three-point arc to a vertex array incl. endpoints."""
    if max_step_deg < 1e-6:
        max_step_deg = DEFAULT_ARC_STEP_DEG
    # direction symmetry: same arc from either end -> reversed vertices
    if x0 < x2 or (x0 == x2 and y0 < y2):
        rev = curve_to_linestring(x2, y2, x1, y1, x0, y0, max_step_deg)
        return rev[::-1].copy()
    ok, R, cx, cy, a0, a1, a2 = get_curve_parameters(x0, y0, x1, y1, x2, y2)
    step = max(max_step_deg, 1e-2) / 180.0 * math.pi
    nsign = 1 if a1 >= a0 else -1
    step *= nsign
    pts: list = [(x0, y0)]
    if not ok:  # collinear: straight segments through the mid point
        pts.append((x1, y1))
    else:
        _stroke_arc(pts, cx, cy, R, a0, a2, step)
    pts.append((x2, y2))
    return np.asarray(pts, dtype=np.float64)


def linearize_circularstring(coords: np.ndarray, max_step_deg: float = 0.0) -> np.ndarray:
    """CIRCULARSTRING control points (odd count >= 3; arcs over
    consecutive overlapping triplets) -> stroked polyline."""
    coords = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    if len(coords) < 3 or len(coords) % 2 == 0:
        raise ValueError(f"CIRCULARSTRING needs an odd point count >= 3, got {len(coords)}")
    out = [coords[:1]]
    for i in range(0, len(coords) - 2, 2):
        seg = curve_to_linestring(*coords[i], *coords[i + 1], *coords[i + 2], max_step_deg)
        out.append(seg[1:])  # joint vertex already emitted
    return np.concatenate(out, axis=0)
