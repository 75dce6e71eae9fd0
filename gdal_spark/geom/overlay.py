"""General polygon boolean overlay: snap-rounded planar arrangement.

Intersection / Union / Difference / SymDifference of two polygon
REGIONS without GEOS, via the classic map-overlay construction
(planar subdivision + side classification; de Berg et al.,
"Computational Geometry", ch. 2 map overlay, adapted to edge-side
labeling so no explicit face structure is needed):

  1. NODE   split every edge of both inputs at every incidence with
            any other edge (proper crossings, T-joints, collinear
            overlaps). Coordinates are translated to a local origin
            and snapped to a 1/2^SNAP_BITS grid, so every incidence
            predicate is exact integer arithmetic inside float64.
  2. LABEL  every unique noded segment gets inside/outside labels
            for each input region on each side (probe points at
            midpoint +- EPS * left-normal, even-odd ray cast over the
            original ring edges; a region is the union over its
            geometries of even-odd(rings) — so overlapping method
            features union correctly).
  3. SELECT a segment lies on the result boundary iff the boolean op
            disagrees across it; orient it region-on-the-LEFT.
  4. LINK   walk segments into rings — at a multiway vertex take the
            first outgoing segment CLOCKWISE from the reversed
            incoming direction (the DCEL face-walk rule); signed
            area decides shell (+) vs hole (-); each hole attaches
            to the smallest enclosing shell.

Reference semantics: OGRGeometry::Intersection/Union/Difference/
SymDifference (ogr/ogrgeometry.cpp:5318,5437,5755,5874 — GEOS-backed
there); this kernel reproduces them for flat polygon inputs up to the
snap grid (the reference exposes the same precision-grid notion via
OGRGeometry::SetPrecision, ogrgeometry.cpp:7024). Zero-area pieces
are dropped, i.e. KEEP_LOWER_DIMENSION_GEOMETRIES=NO behavior
(ogrlayer.cpp:5408-5411); lower-dimension contact is reported
separately by the predicates module (touches).

Also hosts line-vs-region clipping (ogr2ogr -clipsrc for line layers,
apps/ogr2ogr_lib.cpp:6969): the same noding machinery splits the line
at region boundaries and keeps subsegments by midpoint containment
(closed-region convention: boundary-riding parts count as inside).
"""

from __future__ import annotations

import math

import numpy as np

from gdal_spark.geom.predicates import points_in_edges, rings_to_edges

MAX_SNAP_BITS = 40  # generous cap: grid <= 2^-40 of a world unit
EPS_SIDE = 0.25  # side-probe offset, in snapped units (< half grid step)

Ring = np.ndarray  # (k, 2) float64, closed (first == last)
Geom = list  # list[Ring]: ring 0 exterior, rest holes (per part)
Polygon = tuple  # (shell: Ring, holes: list[Ring])

_OPS = {
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "a_not_b": lambda a, b: a & ~b,
    "b_not_a": lambda a, b: ~a & b,
    "xor": lambda a, b: a ^ b,
}


def _snap_frame(geoms_a: list[Geom], geoms_b: list[Geom]):
    """Common translate+scale so both sides snap to one exact grid.

    The scale ADAPTS to the coordinate span in BOTH directions:
    snapped magnitudes are kept <= 2^25 so every cross product in the
    noding predicates stays < 2^50 — exactly representable in float64.
    The 2^25 exactness bound is the ONLY constraint: tiny extents
    (e.g. 0.002-degree lon/lat features) get a correspondingly finer
    grid instead of collapsing to a fixed 1/64-unit resolution, and
    continent-scale extents (web-mercator meters, span ~4e7) trade
    grid resolution for exactness instead of silently breaking the
    integer invariant. Returns (fwd, inv, scale); scale is a power of
    two so fwd/inv round-trip exactly in float64."""
    minx = math.inf
    miny = math.inf
    maxx = -math.inf
    maxy = -math.inf
    for side in (geoms_a, geoms_b):
        for rings in side:
            for r in rings:
                if len(r):
                    minx = min(minx, float(np.min(r[:, 0])))
                    miny = min(miny, float(np.min(r[:, 1])))
                    maxx = max(maxx, float(np.max(r[:, 0])))
                    maxy = max(maxy, float(np.max(r[:, 1])))
    if not math.isfinite(minx):
        minx = miny = 0.0
        maxx = maxy = 0.0
    span = max(maxx - minx, maxy - miny)
    if span <= 0.0:
        span = 1.0  # degenerate (single point / empty): any grid works
    k = min(MAX_SNAP_BITS, int(math.floor(math.log2((1 << 25) / span))))
    scale = float(2.0 ** k)

    def fwd(r: np.ndarray) -> np.ndarray:
        return np.round((r - (minx, miny)) * scale)

    def inv(r: np.ndarray) -> np.ndarray:
        return r / scale + (minx, miny)

    return fwd, inv, scale


def snap_cell_area(geoms_a: list[Geom], geoms_b: list[Geom]) -> float:
    """World-unit area of one snap-grid cell for the frame
    _snap_frame picks for these inputs. Predicates that test overlay
    areas against "zero" scale their epsilon by this (the smallest
    representable positive area in the arrangement is half a cell)."""
    _, _, scale = _snap_frame(geoms_a, geoms_b)
    return 1.0 / (scale * scale)


def _edges_of(geoms: list[Geom], fwd) -> tuple[np.ndarray, list]:
    """All snapped edges of a side as one (E,4) array + per-geometry
    snapped edge tables (for the even-odd probes)."""
    per_geom = []
    chunks = []
    for rings in geoms:
        snapped = [fwd(np.asarray(r, dtype=np.float64).reshape(-1, 2)) for r in rings]
        t = rings_to_edges(snapped)
        per_geom.append(t)
        x1, y1, x2, y2 = t
        if len(x1):
            chunks.append(np.column_stack([x1, y1, x2, y2]))
    e = np.concatenate(chunks, axis=0) if chunks else np.empty((0, 4))
    keep = (e[:, 0] != e[:, 2]) | (e[:, 1] != e[:, 3])
    return e[keep], per_geom


def _cross(ox, oy, ax, ay, bx, by) -> float:
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _node_edges(edges: np.ndarray) -> list[tuple]:
    """Split all edges at mutual incidences; return unique undirected
    integer segments [( (x1,y1), (x2,y2) ), ...] with canonical order.

    Candidate pairs come from a vectorized bbox-overlap prefilter;
    the per-pair incidence analysis is exact (integer cross products).
    """
    n = len(edges)
    if n == 0:
        return []
    x1, y1, x2, y2 = edges.T
    bminx, bmaxx = np.minimum(x1, x2), np.maximum(x1, x2)
    bminy, bmaxy = np.minimum(y1, y2), np.maximum(y1, y2)
    # candidate pairs i<j with bbox overlap — generated block-wise so
    # memory stays O(block^2), not O(n^2) (large coastline-style rings
    # would otherwise materialize n(n-1)/2 indices at once)
    BLK = 1024
    ii_parts: list[np.ndarray] = []
    jj_parts: list[np.ndarray] = []
    for bi in range(0, n, BLK):
        ei = min(bi + BLK, n)
        for bj in range(bi, n, BLK):
            ej = min(bj + BLK, n)
            a = np.arange(bi, ei)
            c = np.arange(bj, ej)
            ok = (
                (bminx[a][:, None] <= bmaxx[c][None, :])
                & (bminx[c][None, :] <= bmaxx[a][:, None])
                & (bminy[a][:, None] <= bmaxy[c][None, :])
                & (bminy[c][None, :] <= bmaxy[a][:, None])
            )
            ai, cj = np.nonzero(ok)
            gi, gj = a[ai], c[cj]
            keep = gi < gj  # i < j only (diagonal blocks contain both orders)
            ii_parts.append(gi[keep])
            jj_parts.append(gj[keep])
    ii = np.concatenate(ii_parts) if ii_parts else np.empty(0, dtype=np.int64)
    jj = np.concatenate(jj_parts) if jj_parts else np.empty(0, dtype=np.int64)

    splits: list[list[tuple]] = [[] for _ in range(n)]

    def on_open_segment(px, py, ax, ay, bx, by) -> bool:
        """p strictly between a and b (collinearity checked by caller)."""
        if ax != bx:
            return min(ax, bx) < px < max(ax, bx)
        return min(ay, by) < py < max(ay, by)

    for i, j in zip(ii, jj):
        p1 = (x1[i], y1[i]); p2 = (x2[i], y2[i])
        q1 = (x1[j], y1[j]); q2 = (x2[j], y2[j])
        d1 = _cross(p1[0], p1[1], p2[0], p2[1], q1[0], q1[1])
        d2 = _cross(p1[0], p1[1], p2[0], p2[1], q2[0], q2[1])
        d3 = _cross(q1[0], q1[1], q2[0], q2[1], p1[0], p1[1])
        d4 = _cross(q1[0], q1[1], q2[0], q2[1], p2[0], p2[1])
        if d1 == 0 and d2 == 0:  # collinear: exchange interior endpoints
            for (px, py) in (q1, q2):
                if on_open_segment(px, py, *p1, *p2):
                    splits[i].append((px, py))
            for (px, py) in (p1, p2):
                if on_open_segment(px, py, *q1, *q2):
                    splits[j].append((px, py))
            continue
        if (d1 < 0) != (d2 < 0) and (d3 < 0) != (d4 < 0) and 0 not in (d1, d2, d3, d4):
            # proper crossing: one rational point, rounded ONCE so both
            # edges split at the identical grid point
            denom = _cross(0, 0, p2[0] - p1[0], p2[1] - p1[1], q2[0] - q1[0], q2[1] - q1[1])
            t = _cross(0, 0, q1[0] - p1[0], q1[1] - p1[1], q2[0] - q1[0], q2[1] - q1[1]) / denom
            px = round(p1[0] + t * (p2[0] - p1[0]))
            py = round(p1[1] + t * (p2[1] - p1[1]))
            splits[i].append((px, py))
            splits[j].append((px, py))
            continue
        # T-joints: an endpoint of one lying ON the open interior of the other
        if d3 == 0 and on_open_segment(p1[0], p1[1], *q1, *q2):
            splits[j].append(p1)
        if d4 == 0 and on_open_segment(p2[0], p2[1], *q1, *q2):
            splits[j].append(p2)
        if d1 == 0 and on_open_segment(q1[0], q1[1], *p1, *p2):
            splits[i].append(q1)
        if d2 == 0 and on_open_segment(q2[0], q2[1], *p1, *p2):
            splits[i].append(q2)

    segs: set[tuple] = set()
    for k in range(n):
        a = (x1[k], y1[k])
        b = (x2[k], y2[k])
        pts = [a, b] + splits[k]
        dx, dy = b[0] - a[0], b[1] - a[1]
        pts = sorted(set(pts), key=lambda p: (p[0] - a[0]) * dx + (p[1] - a[1]) * dy)
        for u, v in zip(pts[:-1], pts[1:]):
            if u != v:
                segs.add((u, v) if u < v else (v, u))
    return sorted(segs)


def _label_segments(segs: list[tuple], tables_a: list, tables_b: list):
    """(S,) bool arrays inA_left, inA_right, inB_left, inB_right via
    midpoint +- EPS * left-normal probes (vectorized per geometry)."""
    s = np.asarray(segs, dtype=np.float64).reshape(-1, 2, 2)
    mid = s.mean(axis=1)
    d = s[:, 1] - s[:, 0]
    ln = np.linalg.norm(d, axis=1, keepdims=True)
    nl = np.column_stack([-d[:, 1], d[:, 0]]) / ln  # left normal
    pl = mid + EPS_SIDE * nl
    pr = mid - EPS_SIDE * nl

    def region(px, py, tables):
        out = np.zeros(len(px), dtype=bool)
        for t in tables:
            out |= points_in_edges(px, py, t, boundary=False)
        return out

    return (
        region(pl[:, 0], pl[:, 1], tables_a),
        region(pr[:, 0], pr[:, 1], tables_a),
        region(pl[:, 0], pl[:, 1], tables_b),
        region(pr[:, 0], pr[:, 1], tables_b),
    )


def _ring_signed_area(ring: np.ndarray) -> float:
    # centered on the first vertex: translation-invariant, and avoids
    # the catastrophic x_i*y_j cancellation for small rings far from
    # the origin (exact for snapped integer rings either way)
    x = ring[:, 0] - ring[0, 0]
    y = ring[:, 1] - ring[0, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _assemble_rings(directed: list[tuple]) -> list[np.ndarray]:
    """Link region-on-left directed segments into closed rings (DCEL
    face walk: next = first outgoing clockwise from reversed incoming)."""
    out_at: dict[tuple, list[int]] = {}
    for k, (u, v) in enumerate(directed):
        out_at.setdefault(u, []).append(k)
    used = [False] * len(directed)
    rings = []
    for start in range(len(directed)):
        if used[start]:
            continue
        path = [directed[start][0]]
        cur = start
        for _ in range(len(directed) + 1):
            used[cur] = True
            u, v = directed[cur]
            path.append(v)
            if v == directed[start][0] and len(path) > 2:
                rings.append(np.asarray(path, dtype=np.float64))
                break
            # reversed incoming direction
            rx, ry = u[0] - v[0], u[1] - v[1]
            ra = math.atan2(ry, rx)
            best, best_ang = -1, math.inf
            for k in out_at.get(v, ()):
                if used[k]:
                    continue
                w = directed[k][1]
                wa = math.atan2(w[1] - v[1], w[0] - v[0])
                ang = (ra - wa) % (2 * math.pi)  # clockwise from reversed-in
                if ang == 0.0:
                    ang = 2 * math.pi
                if ang < best_ang:
                    best, best_ang = k, ang
            if best < 0:
                break  # open chain (arrangement inconsistency) — drop
            cur = best
    return rings


def overlay(geoms_a: list[Geom], geoms_b: list[Geom], op: str) -> list[Polygon]:
    """Boolean overlay of two polygon regions.

    geoms_a / geoms_b: list of geometries, each a list of rings
    ((k,2) arrays; ring 0 exterior, rest holes, parts of a multi
    polygon are separate list entries). A point is inside a region iff
    it is inside ANY of the region's geometries (even-odd per
    geometry) — so self-overlapping feature sets behave as their
    union, matching the incremental Difference loop of
    ogrlayer.cpp:5803 (Union leftovers).

    op: and | or | a_not_b | b_not_a | xor.
    Returns [(shell, holes)] in input coordinates; [] when empty.
    """
    f = _OPS[op]
    fwd, inv, _ = _snap_frame(geoms_a, geoms_b)
    ea, tables_a = _edges_of(geoms_a, fwd)
    eb, tables_b = _edges_of(geoms_b, fwd)
    all_edges = np.concatenate([ea, eb], axis=0) if len(ea) or len(eb) else np.empty((0, 4))
    segs = _node_edges(all_edges)
    if not segs:
        return []
    al, ar, bl, br = _label_segments(segs, tables_a, tables_b)
    fl, fr = f(al, bl), f(ar, br)
    on_boundary = fl != fr
    directed = []
    for k in np.flatnonzero(on_boundary):
        u, v = segs[k]
        directed.append((u, v) if fl[k] else (v, u))  # region on left
    if not directed:
        return []
    rings = _assemble_rings(directed)
    shells: list[tuple[float, np.ndarray]] = []
    holes: list[np.ndarray] = []
    for r in rings:
        a = _ring_signed_area(r)
        if a > 0:
            shells.append((a, r))
        elif a < 0:
            holes.append(r)
    if not shells:
        return []
    shells.sort(key=lambda t: t[0])  # smallest first -> innermost wins
    polys: list[list] = [[inv(r), []] for _, r in shells]
    for h in holes:
        # probe just inside the region adjacent to the hole boundary
        u, v = h[0], h[1]
        mid = (u + v) / 2.0
        d = v - u
        n = np.array([-d[1], d[0]]) / math.hypot(d[0], d[1])
        p = mid + EPS_SIDE * n  # region is on the LEFT of hole edges too
        for idx, (_, r) in enumerate(shells):
            if points_in_edges([p[0]], [p[1]], rings_to_edges([r]), boundary=False)[0]:
                polys[idx][1].append(inv(h))
                break
    return [(shell, hs) for shell, hs in polys]


def boundary_contact(geoms_a: list[Geom], geoms_b: list[Geom]) -> list[np.ndarray]:
    """Shared-boundary line contact between two regions whose interiors
    do not meet there: the KEEP_LOWER_DIMENSION_GEOMETRIES=YES piece of
    OGRLayer::Intersection for touching polygons (ogrlayer.cpp:5405 —
    GEOS returns the shared LINESTRING). A segment is contact iff it
    lies on BOTH boundaries and the A∩B region is empty on both of its
    sides (so the boundary of a positive-area overlap is excluded).
    Point-only contact (corner touches) is not reported. Returns
    merged polylines in input coordinates."""
    fwd, inv, _ = _snap_frame(geoms_a, geoms_b)
    ea, tables_a = _edges_of(geoms_a, fwd)
    eb, tables_b = _edges_of(geoms_b, fwd)
    if len(ea) == 0 or len(eb) == 0:
        return []
    segs = _node_edges(np.concatenate([ea, eb], axis=0))
    if not segs:
        return []
    al, ar, bl, br = _label_segments(segs, tables_a, tables_b)
    contact = (al != ar) & (bl != br) & ~(al & bl) & ~(ar & br)
    from gdal_spark.operators.dissolve import merge_lines

    lines = [
        np.asarray(segs[k], dtype=np.float64) for k in np.flatnonzero(contact)
    ]
    return [inv(ln) for ln in merge_lines(lines)]


def point_contact(geoms_a: list[Geom], geoms_b: list[Geom]) -> np.ndarray:
    """Point-only (corner) contact between two regions: nodes where
    BOTH boundaries pass through, no incident sector has both
    interiors (the A∩B region is empty around the node), and the node
    is not already covered by a line-contact segment — the POINT
    pieces of GEOS Intersection for polygons touching at a vertex or
    a vertex-on-edge T-touch (ogrlayer.cpp:5405 KLDG=YES keeps them).
    Returns an (N, 2) array in input coordinates."""
    fwd, inv, _ = _snap_frame(geoms_a, geoms_b)
    ea, tables_a = _edges_of(geoms_a, fwd)
    eb, tables_b = _edges_of(geoms_b, fwd)
    if len(ea) == 0 or len(eb) == 0:
        return np.empty((0, 2))
    segs = _node_edges(np.concatenate([ea, eb], axis=0))
    if not segs:
        return np.empty((0, 2))
    al, ar, bl, br = _label_segments(segs, tables_a, tables_b)
    on_a = al != ar
    on_b = bl != br
    overlap_side = (al & bl) | (ar & br)
    line_contact = on_a & on_b & ~overlap_side
    info: dict[tuple, list] = {}
    on_line: set[tuple] = set()
    for k, (u, v) in enumerate(segs):
        for p in (tuple(u), tuple(v)):
            d = info.setdefault(p, [False, False, False])
            d[0] |= bool(on_a[k])
            d[1] |= bool(on_b[k])
            d[2] |= bool(overlap_side[k])
            if line_contact[k]:
                on_line.add(p)
    pts = sorted(
        p for p, d in info.items() if d[0] and d[1] and not d[2] and p not in on_line
    )
    if not pts:
        return np.empty((0, 2))
    return inv(np.asarray(pts, dtype=np.float64).reshape(-1, 2))


def region_area(polys: list[Polygon]) -> float:
    """Planar area of an overlay result."""
    total = 0.0
    for shell, holes in polys:
        total += abs(_ring_signed_area(shell))
        for h in holes:
            total -= abs(_ring_signed_area(h))
    return total


# ---------------------------------------------------------------------------
# line-vs-region clipping (ogr2ogr -clipsrc on line layers,
# apps/ogr2ogr_lib.cpp:6969; Cohen-Sutherland generalized to any region)


def clip_line(line: np.ndarray, geoms: list[Geom], keep_inside: bool = True) -> list[np.ndarray]:
    """Clip a polyline against a polygon region.

    Splits the line at every region-boundary crossing, classifies each
    piece by its midpoint (closed region: boundary-riding pieces count
    as inside), and re-chains consecutive kept pieces. Returns a list
    of (k,2) polylines in input coordinates."""
    line = np.asarray(line, dtype=np.float64).reshape(-1, 2)
    if len(line) < 2:
        return []
    fwd, inv, _ = _snap_frame([[line]], geoms)
    sl = fwd(line)
    tables = []
    chunks = []
    for rings in geoms:
        snapped = [fwd(np.asarray(r, dtype=np.float64).reshape(-1, 2)) for r in rings]
        t = rings_to_edges(snapped)
        tables.append(t)
        if len(t[0]):
            chunks.append(np.column_stack(t))
    reg_edges = np.concatenate(chunks, axis=0) if chunks else np.empty((0, 4))

    pieces: list[np.ndarray] = []
    current: list[np.ndarray] = []
    for a, b in zip(sl[:-1], sl[1:]):
        if (a == b).all():
            continue
        seg = np.array([[a[0], a[1], b[0], b[1]]])
        noded = _node_edges(np.concatenate([seg, reg_edges], axis=0))
        # keep only sub-segments of THIS line segment (collinear with ab,
        # within its bbox)
        subs = []
        for (u, v) in noded:
            if _cross(a[0], a[1], b[0], b[1], u[0], u[1]) == 0 and _cross(
                a[0], a[1], b[0], b[1], v[0], v[1]
            ) == 0:
                lo = (min(a[0], b[0]), min(a[1], b[1]))
                hi = (max(a[0], b[0]), max(a[1], b[1]))
                if (
                    lo[0] <= u[0] <= hi[0] and lo[1] <= u[1] <= hi[1]
                    and lo[0] <= v[0] <= hi[0] and lo[1] <= v[1] <= hi[1]
                ):
                    subs.append((u, v))
        # order along a->b and orient each sub u->v along the travel dir
        dx, dy = b[0] - a[0], b[1] - a[1]
        oriented = []
        for (u, v) in subs:
            if (v[0] - u[0]) * dx + (v[1] - u[1]) * dy < 0:
                u, v = v, u
            oriented.append((u, v))
        oriented.sort(key=lambda p: (p[0][0] - a[0]) * dx + (p[0][1] - a[1]) * dy)
        for (u, v) in oriented:
            mx, my = (u[0] + v[0]) / 2.0, (u[1] + v[1]) / 2.0
            inside = False
            for t in tables:
                if points_in_edges([mx], [my], t, boundary=True)[0]:
                    inside = True
                    break
            if inside == keep_inside:
                pu = np.array(u, dtype=np.float64)
                pv = np.array(v, dtype=np.float64)
                if current and (current[-1] == pu).all():
                    current.append(pv)
                else:
                    if len(current) >= 2:
                        pieces.append(np.asarray(current))
                    current = [pu, pv]
            else:
                if len(current) >= 2:
                    pieces.append(np.asarray(current))
                current = []
    if len(current) >= 2:
        pieces.append(np.asarray(current))
    return [inv(p) for p in pieces]
