"""Vectorized geometric predicates: ray-cast containment, segment
intersection, and the OGR 3-stage spatial-filter cascade.

Reference semantics (file:line in /root/reference):
  - FilterGeometry cascade: ogr/ogrsf_frmts/generic/ogrlayer.cpp:4004
      stage 0: no filter -> all pass; NULL/EMPTY geometry -> fail
      stage 1: envelope overlap reject (STRICT < comparisons: touching
               envelopes survive)
      stage 2 (filter is its own envelope): geometry envelope fully
               contained -> accept; else any POINT of the geometry
               (polygon: exterior-ring vertices only,
               DoesGeometryHavePointInEnvelope, ogrlayer.cpp:3933)
               inside filter envelope -> accept
      stage 3: exact prepared-geometry Intersects (GEOS); withOUT GEOS
               returns TRUE (the 4-vs-5 split of
               autotest/utilities/test_ogr2ogr.py:77-94)
  - point-in-polygon: even-odd rule, same as the rasterizer's
    pixel-center inside test (alg/llrasterize.cpp:41-45) and GEOS.

All predicates are numpy-vectorized over point batches; polygon sets
are expected to be the small broadcast side.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geom.batch import GeomBatch, GeomType


# ---------------------------------------------------------------------------
# edge tables


def rings_to_edges(rings: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Flatten closed rings to edge arrays (x1, y1, x2, y2).

    Rings are closed (first == last vertex, WKT convention); consecutive
    vertex pairs within each ring become edges. Unclosed rings are
    closed implicitly (createFromWkt tolerates it).
    """
    xs1, ys1, xs2, ys2 = [], [], [], []
    for r in rings:
        if len(r) < 2:
            continue
        a = r
        if not (r[0] == r[-1]).all():
            a = np.vstack([r, r[:1]])
        xs1.append(a[:-1, 0])
        ys1.append(a[:-1, 1])
        xs2.append(a[1:, 0])
        ys2.append(a[1:, 1])
    if not xs1:
        z = np.empty(0)
        return z, z, z, z
    return (np.concatenate(xs1), np.concatenate(ys1), np.concatenate(xs2), np.concatenate(ys2))


def line_to_edges(coords: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    if len(coords) < 2:
        z = np.empty(0)
        return z, z, z, z
    return coords[:-1, 0], coords[:-1, 1], coords[1:, 0], coords[1:, 1]


# ---------------------------------------------------------------------------
# containment


def points_in_edges(px: np.ndarray, py: np.ndarray, edges, boundary: bool = True) -> np.ndarray:
    """Even-odd ray cast of N points against an edge table.

    Crossing rule matches the reference scanline rule
    (alg/llrasterize.cpp:41-45): edge crosses the horizontal ray iff
    (y1 <= py < y2) or (y2 <= py < y1) — half-open so shared vertices
    count once — and the intersection x is strictly right of px.

    boundary=True (default) additionally accepts points exactly ON an
    edge, making the result GEOS-Intersects-equivalent (closed sets —
    ogrgeometry.cpp:575 Intersects is GEOS-backed; parity alone is
    half-open on right/top edges). boundary=False keeps raw parity
    (the rasterizer's pixel-center rule, where centers at .5 offsets
    never hit integer edges).
    """
    x1, y1, x2, y2 = edges
    px = np.asarray(px, dtype=np.float64).reshape(-1, 1)
    py = np.asarray(py, dtype=np.float64).reshape(-1, 1)
    if len(x1) == 0:
        return np.zeros(px.shape[0], dtype=bool)
    crosses = (y1 <= py) != (y2 <= py)  # (N, E)
    # x of edge at scanline py (safe: where ~crosses the value is unused)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    hits = crosses & (xint > px)
    inside = (hits.sum(axis=1) & 1).astype(bool)
    if boundary:
        on_edge = (
            ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) == 0)
            & (np.minimum(x1, x2) <= px)
            & (px <= np.maximum(x1, x2))
            & (np.minimum(y1, y2) <= py)
            & (py <= np.maximum(y1, y2))
        )
        inside |= on_edge.any(axis=1)
    return inside


def points_in_rings(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd containment incl. holes (even-odd over ALL rings)."""
    return points_in_edges(px, py, rings_to_edges(rings))


def points_in_rect(px, py, minx, miny, maxx, maxy) -> np.ndarray:
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    return (px >= minx) & (py >= miny) & (px <= maxx) & (py <= maxy)


# ---------------------------------------------------------------------------
# segment intersection


def _cross_sign(ox, oy, ax, ay, bx, by):
    """sign of cross(a-o, b-o) — broadcastable."""
    return np.sign((ax - ox) * (by - oy) - (ay - oy) * (bx - ox))


def edges_intersect_any(ea, eb) -> bool:
    """True iff any edge of table ea intersects any edge of table eb
    (proper or improper, incl. collinear overlap). Vectorized over the
    full Ea×Eb pair matrix."""
    ax1, ay1, ax2, ay2 = (v.reshape(-1, 1) for v in ea)
    bx1, by1, bx2, by2 = eb
    if ax1.size == 0 or bx1.size == 0:
        return False
    d1 = _cross_sign(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = _cross_sign(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = _cross_sign(bx1, by1, bx2, by2, ax1, ay1)
    d4 = _cross_sign(bx1, by1, bx2, by2, ax2, ay2)
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    if proper.any():
        return True

    def on_seg(px, py, x1, y1, x2, y2):
        return (
            (np.minimum(x1, x2) <= px)
            & (px <= np.maximum(x1, x2))
            & (np.minimum(y1, y2) <= py)
            & (py <= np.maximum(y1, y2))
        )

    touch = (
        ((d1 == 0) & on_seg(bx1, by1, ax1, ay1, ax2, ay2))
        | ((d2 == 0) & on_seg(bx2, by2, ax1, ay1, ax2, ay2))
        | ((d3 == 0) & on_seg(ax1, ay1, bx1, by1, bx2, by2))
        | ((d4 == 0) & on_seg(ax2, ay2, bx1, by1, bx2, by2))
    )
    return bool(touch.any())


# ---------------------------------------------------------------------------
# exact Intersects (GEOS-equivalent for flat 2D types)


def geometry_intersects_rings(
    gtype: GeomType, parts: list[list[np.ndarray]], poly_rings: list[np.ndarray], poly_edges=None
) -> bool:
    """Exact Intersects(geometry, polygon) for one geometry.

    Polygon-vs-X via the classic decomposition: any vertex of X inside
    the polygon, or any polygon vertex inside X (polygon X only), or
    any edge crossing. Equivalent to GEOS Intersects for valid inputs
    (ogrgeometry.cpp:575 Intersects is GEOS-backed).
    """
    if poly_edges is None:
        poly_edges = rings_to_edges(poly_rings)
    if gtype == GeomType.POINT or gtype == GeomType.MULTIPOINT:
        pts = np.concatenate([rings[0] for rings in parts], axis=0)
        return bool(points_in_edges(pts[:, 0], pts[:, 1], poly_edges).any())
    if gtype in (GeomType.LINESTRING, GeomType.MULTILINESTRING):
        for rings in parts:
            line = rings[0]
            if points_in_edges(line[:, 0], line[:, 1], poly_edges).any():
                return True
            if edges_intersect_any(line_to_edges(line), poly_edges):
                return True
        return False
    if gtype in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
        poly_first = poly_rings[0] if poly_rings else np.empty((0, 2))
        for rings in parts:
            ext = rings[0]
            if points_in_edges(ext[:, 0], ext[:, 1], poly_edges).any():
                return True
            if len(poly_first) and points_in_rings(poly_first[:, 0], poly_first[:, 1], rings).any():
                return True
            if edges_intersect_any(rings_to_edges(rings), poly_edges):
                return True
        return False
    return False


def batch_intersects_rings(batch: GeomBatch, i: int, poly_rings, poly_edges=None) -> bool:
    """Exact Intersects(batch geometry i, polygon) — the GC-aware
    entry: a GEOMETRYCOLLECTION intersects iff ANY member does (GEOS
    Intersects supports GC by member union)."""
    gtype, parts = batch.geometry(i)
    gtype = GeomType(gtype)
    if gtype == GeomType.GEOMETRYCOLLECTION:
        if poly_edges is None:
            poly_edges = rings_to_edges(poly_rings)
        return any(
            geometry_intersects_rings(mt, [rings], poly_rings, poly_edges)
            for mt, rings in batch.collection_members(i)
        )
    return geometry_intersects_rings(gtype, parts, poly_rings, poly_edges)


def rings_is_rectangle(rings: list[np.ndarray]) -> bool:
    """OGRGeometry::IsRectangle analog (ogrgeometry.cpp): single ring,
    5 points (closed), axis-parallel edges."""
    if len(rings) != 1:
        return False
    r = rings[0]
    if len(r) != 5 or not (r[0] == r[-1]).all():
        return False
    dx = r[1:, 0] - r[:-1, 0]
    dy = r[1:, 1] - r[:-1, 1]
    return bool(np.all((dx == 0) | (dy == 0)))


# ---------------------------------------------------------------------------
# the cascade


def filter_geometry_batch(
    batch: GeomBatch,
    filter_rings: list[np.ndarray],
    exact: bool = True,
) -> np.ndarray:
    """OGRLayer::FilterGeometry over a batch -> bool mask.

    exact=False reproduces the no-GEOS behavior (stage-3 returns TRUE),
    the envelope-only mode of autotest/utilities/test_ogr2ogr.py:77-94.
    """
    n = len(batch)
    fe = rings_to_edges(filter_rings)
    f_env = (
        min(r[:, 0].min() for r in filter_rings),
        min(r[:, 1].min() for r in filter_rings),
        max(r[:, 0].max() for r in filter_rings),
        max(r[:, 1].max() for r in filter_rings),
    )
    is_env = rings_is_rectangle(filter_rings)

    out = np.zeros(n, dtype=bool)
    envs = batch.envelopes()
    empty = batch.is_empty
    # stage 1: envelope overlap (strict-< reject, ogrlayer.cpp:4031-4035)
    overlap = ~(
        (envs[:, 2] < f_env[0])
        | (envs[:, 3] < f_env[1])
        | (f_env[2] < envs[:, 0])
        | (f_env[3] < envs[:, 1])
    )
    candidates = np.flatnonzero(overlap & ~empty & ~np.isnan(envs[:, 0]))
    if candidates.size == 0:
        return out

    if is_env:
        # stage 2a: envelope containment accept
        contained = (
            (envs[candidates, 0] >= f_env[0])
            & (envs[candidates, 1] >= f_env[1])
            & (envs[candidates, 2] <= f_env[2])
            & (envs[candidates, 3] <= f_env[3])
        )
        out[candidates[contained]] = True
        remaining = candidates[~contained]
        # stage 2b: any vertex (exterior ring only for polygons) in envelope
        still = []
        for i in remaining:
            gtype, parts = batch.geometry(i)
            vs = []
            for rings in parts:
                if gtype in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
                    vs.append(rings[0])  # exterior ring only (ogrlayer.cpp:3955)
                else:
                    vs.append(rings[0])
            v = np.concatenate(vs, axis=0) if vs else np.empty((0, 2))
            if points_in_rect(v[:, 0], v[:, 1], *f_env).any():
                out[i] = True
            else:
                still.append(i)
        remaining = np.asarray(still, dtype=np.int64)
    else:
        remaining = candidates

    # stage 3: exact intersects (or no-GEOS TRUE)
    if not exact:
        out[remaining] = True
        return out
    # vectorized fast path: all-point batch
    ptmask = (batch.types[remaining] == GeomType.POINT) if remaining.size else np.empty(0, dtype=bool)
    pts_idx = remaining[ptmask]
    if pts_idx.size:
        first_ring = batch.part_ring_off[batch.geom_part_off[pts_idx]]
        cidx = batch.ring_coord_off[first_ring]
        px = batch.coords[cidx, 0]
        py = batch.coords[cidx, 1]
        out[pts_idx] = points_in_edges(px, py, fe)
    for i in remaining[~ptmask] if remaining.size else []:
        out[i] = batch_intersects_rings(batch, i, filter_rings, fe)
    return out
