"""Pairwise geometry predicates: Within / Contains / Touches /
Crosses / Overlaps / Equals / Intersects / Disjoint.

Reference: the GEOS-backed OGRGeometry methods (ogr/ogrgeometry.cpp —
Intersects :575, Disjoint :6009, Touches :6082, Crosses :6155,
Within :6262, Contains :6335, Overlaps :6409, Equals :1261).

Strategy by dimension pair (DE-9IM collapsed to the flat-2D cases):

  poly x poly   area-based through the snap-rounded overlay kernel:
                within(a,b)   <=> area(a \\ b) = 0 and area(a) > 0
                touches       <=> intersects and area(a ∩ b) = 0
                overlaps      <=> all of a∩b, a\\b, b\\a have area > 0
                equals        <=> area(a xor b) = 0
                (a polygon boundary sticking outside a closed region
                forces positive a\\b area, so the area tests are exact
                point-set tests for valid polygons)
  point x poly  closed / strict / boundary containment
  line  x poly  noded sub-segment classification (clip_line machinery)
  line  x line  contact analysis at noded vertices: interior = any
                point of the polyline except its two terminal
                endpoints; collinear overlap = dim-1 contact
  point x line  on-edge vs terminal-endpoint
  point x point coordinate-set algebra

Known simplifications (documented deviations): line-within-line uses
vertex+midpoint collinearity (sufficient for noded simple inputs);
Crosses for mixed point sets means "some strictly in, some strictly
out". Curves/3D are out of scope (parser linearizes nothing; flat 2D
only, SURVEY.md §1.1).
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geom.batch import GeomBatch, GeomType
from gdal_spark.geom.overlay import clip_line, overlay, region_area, snap_cell_area
from gdal_spark.geom.predicates import (
    edges_intersect_any,
    geometry_intersects_rings,
    line_to_edges,
    points_in_edges,
    rings_to_edges,
)

def _area_eps(ra: list, rb: list) -> float:
    """Area threshold below which an overlay result counts as empty,
    scaled to the snap grid the kernel will use for this pair (a
    genuine interior overlap occupies at least half a snap cell; a
    quarter cell cleanly separates it from noise). Replaces a fixed
    1e-9 that broke tiny lon/lat-extent features (ADVICE r2)."""
    return 0.25 * snap_cell_area(ra, rb)

_DIM = {
    GeomType.POINT: 0, GeomType.MULTIPOINT: 0,
    GeomType.LINESTRING: 1, GeomType.MULTILINESTRING: 1,
    GeomType.POLYGON: 2, GeomType.MULTIPOLYGON: 2,
}


class Geometry:
    """One parsed geometry in predicate-friendly form."""

    def __init__(self, gtype: GeomType, parts: list, members: list | None = None):
        self.gtype = gtype
        self.dim = _DIM.get(gtype)
        self.parts = parts
        # (atomic member type, rings) pairs — GEOMETRYCOLLECTION only
        self.members = members

    @classmethod
    def from_batch(cls, batch: GeomBatch, i: int) -> "Geometry":
        gtype, parts = batch.geometry(i)
        gtype = GeomType(gtype)
        members = batch.collection_members(i) if gtype == GeomType.GEOMETRYCOLLECTION else None
        return cls(gtype, parts, members)

    @classmethod
    def from_wkt(cls, wkt: str) -> "Geometry":
        from gdal_spark.geom.wkt import parse_wkt

        b = parse_wkt([wkt])
        return cls.from_batch(b, 0)

    # --- views -----------------------------------------------------------
    def points(self) -> np.ndarray:
        return np.concatenate([r[0] for r in self.parts], axis=0) if self.parts else np.empty((0, 2))

    def lines(self) -> list[np.ndarray]:
        return [r[0] for r in self.parts]

    def rings(self) -> list[np.ndarray]:
        return [ring for rings in self.parts for ring in rings]

    def region(self) -> list:
        return [self.rings()]

    def edges(self):
        if self.dim == 2:
            return rings_to_edges(self.rings())
        if self.dim == 1:
            xs = [line_to_edges(ln) for ln in self.lines()]
            return tuple(np.concatenate([t[k] for t in xs]) for k in range(4))
        return (np.empty(0),) * 4

    def terminals(self) -> set:
        """Boundary points of a (multi)line: each part's two ends."""
        out = set()
        for ln in self.lines():
            if len(ln):
                out.add(tuple(ln[0]))
                out.add(tuple(ln[-1]))
        return out


def _on_edges(px, py, edges) -> np.ndarray:
    x1, y1, x2, y2 = edges
    px = np.asarray(px, dtype=np.float64).reshape(-1, 1)
    py = np.asarray(py, dtype=np.float64).reshape(-1, 1)
    if len(x1) == 0:
        return np.zeros(px.shape[0], dtype=bool)
    on = (
        ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) == 0)
        & (np.minimum(x1, x2) <= px) & (px <= np.maximum(x1, x2))
        & (np.minimum(y1, y2) <= py) & (py <= np.maximum(y1, y2))
    )
    return on.any(axis=1)


def _pts_closed(p: np.ndarray, poly: Geometry) -> np.ndarray:
    return points_in_edges(p[:, 0], p[:, 1], poly.edges())


def _pts_strict(p: np.ndarray, poly: Geometry) -> np.ndarray:
    e = poly.edges()
    return points_in_edges(p[:, 0], p[:, 1], e, boundary=False) & ~_on_edges(p[:, 0], p[:, 1], e)


def _line_len(pieces: list[np.ndarray]) -> float:
    return float(sum(np.linalg.norm(np.diff(p, axis=0), axis=1).sum() for p in pieces))


def _line_pieces_in(poly: Geometry, line: Geometry) -> tuple[float, float, bool, bool]:
    """(total_len, inside_len, any_interior, any_exterior) of the line
    vs the closed polygon region."""
    region = poly.region()
    total = _line_len(line.lines())
    kept: list[np.ndarray] = []
    for ln in line.lines():
        kept.extend(clip_line(ln, region, keep_inside=True))
    inside = _line_len(kept)
    any_interior = False
    e = poly.edges()
    for p in kept:
        mids = (p[:-1] + p[1:]) / 2.0
        if (~_on_edges(mids[:, 0], mids[:, 1], e)).any():
            any_interior = True
            break
    any_exterior = inside < total * (1 - 1e-12) - 1e-12 if total > 0 else False
    return total, inside, any_interior, any_exterior


def _line_contacts(a: Geometry, b: Geometry):
    """Contact analysis of two (multi)lines: returns
    (has_any, has_dim1_overlap, contacts) where contacts is a list of
    contact points (tuples)."""
    contacts: set = set()
    dim1 = False
    for la in a.lines():
        for lb in b.lines():
            ea = list(zip(la[:-1], la[1:]))
            eb = list(zip(lb[:-1], lb[1:]))
            for p1, p2 in ea:
                for q1, q2 in eb:
                    d1 = np.cross(p2 - p1, q1 - p1)
                    d2 = np.cross(p2 - p1, q2 - p1)
                    d3 = np.cross(q2 - q1, p1 - q1)
                    d4 = np.cross(q2 - q1, p2 - q1)
                    if d1 == 0 and d2 == 0:  # collinear
                        # 1D overlap test on dominant axis
                        ax = 0 if abs(p2[0] - p1[0]) >= abs(p2[1] - p1[1]) else 1
                        lo1, hi1 = sorted((p1[ax], p2[ax]))
                        lo2, hi2 = sorted((q1[ax], q2[ax]))
                        lo, hi = max(lo1, lo2), min(hi1, hi2)
                        if lo < hi:
                            dim1 = True
                        elif lo == hi:  # endpoint touch on the shared line
                            for pt in (p1, p2, q1, q2):
                                if lo == pt[ax]:
                                    contacts.add(tuple(pt))
                        continue
                    if (d1 < 0) != (d2 < 0) and (d3 < 0) != (d4 < 0) and 0 not in (d1, d2, d3, d4):
                        denom = float(np.cross(p2 - p1, q2 - q1))
                        t = float(np.cross(q1 - p1, q2 - q1)) / denom
                        contacts.add((float(p1[0] + t * (p2[0] - p1[0])), float(p1[1] + t * (p2[1] - p1[1]))))
                        continue
                    # endpoint-on-segment touches
                    def on_seg(p, s1, s2):
                        return (
                            min(s1[0], s2[0]) <= p[0] <= max(s1[0], s2[0])
                            and min(s1[1], s2[1]) <= p[1] <= max(s1[1], s2[1])
                        )

                    if d3 == 0 and on_seg(p1, q1, q2):
                        contacts.add(tuple(p1))
                    if d4 == 0 and on_seg(p2, q1, q2):
                        contacts.add(tuple(p2))
                    if d1 == 0 and on_seg(q1, p1, p2):
                        contacts.add(tuple(q1))
                    if d2 == 0 and on_seg(q2, p1, p2):
                        contacts.add(tuple(q2))
    return (dim1 or bool(contacts)), dim1, contacts


# ---------------------------------------------------------------------------
# predicates


def _gc_guard(a: Geometry, b: Geometry, op: str) -> None:
    """GEOS raises IllegalArgumentException for DE-9IM relate ops on a
    GeometryCollection (geos::geom::IntersectionMatrix path) — mirror
    that instead of silently returning False (only Intersects /
    Disjoint support GC, by member union)."""
    if GeomType.GEOMETRYCOLLECTION in (a.gtype, b.gtype):
        raise ValueError(f"{op} is not supported on GEOMETRYCOLLECTION (GEOS parity)")


def intersects(a: Geometry, b: Geometry) -> bool:
    if a.gtype == GeomType.GEOMETRYCOLLECTION or b.gtype == GeomType.GEOMETRYCOLLECTION:
        if a.gtype != GeomType.GEOMETRYCOLLECTION:
            a, b = b, a
        return any(intersects(Geometry(mt, [rings]), b) for mt, rings in (a.members or []))
    if a.dim is None or b.dim is None:
        return False
    if a.dim > b.dim:
        a, b = b, a
    if b.dim == 2:
        return geometry_intersects_rings(a.gtype, a.parts, b.rings(), b.edges())
    if a.dim == 0 and b.dim == 1:
        p = a.points()
        return bool(_on_edges(p[:, 0], p[:, 1], b.edges()).any())
    if a.dim == 0 and b.dim == 0:
        sa = {tuple(p) for p in a.points()}
        sb = {tuple(p) for p in b.points()}
        return bool(sa & sb)
    # line x line
    has, _, _ = _line_contacts(a, b)
    return has


def disjoint(a: Geometry, b: Geometry) -> bool:
    return not intersects(a, b)


def within(a: Geometry, b: Geometry) -> bool:
    _gc_guard(a, b, "Within")
    if a.dim is None or b.dim is None or a.dim > b.dim:
        return False
    if a.dim == 2:  # poly in poly
        ra, rb = a.region(), b.region()
        eps = _area_eps(ra, rb)
        return (
            region_area(overlay(ra, rb, "a_not_b")) <= eps
            and region_area(overlay(ra, rb, "and")) > eps
        )
    if b.dim == 2:
        if a.dim == 0:
            p = a.points()
            return bool(_pts_closed(p, b).all() and _pts_strict(p, b).any())
        total, inside, any_int, any_ext = _line_pieces_in(b, a)
        return (not any_ext) and any_int
    if a.dim == 0 and b.dim == 1:
        p = a.points()
        on = _on_edges(p[:, 0], p[:, 1], b.edges())
        if not on.all():
            return False
        term = b.terminals()
        return any(tuple(q) not in term for q in p)
    if a.dim == 0 and b.dim == 0:
        sa = {tuple(p) for p in a.points()}
        sb = {tuple(p) for p in b.points()}
        return sa <= sb
    # line in line (simplified: vertices + midpoints collinear-covered)
    eb = b.edges()
    for ln in a.lines():
        mids = (ln[:-1] + ln[1:]) / 2.0
        pts = np.concatenate([ln, mids], axis=0)
        if not _on_edges(pts[:, 0], pts[:, 1], eb).all():
            return False
    return True


def contains(a: Geometry, b: Geometry) -> bool:
    _gc_guard(a, b, "Contains")
    return within(b, a)


def touches(a: Geometry, b: Geometry) -> bool:
    _gc_guard(a, b, "Touches")
    if a.dim is None or b.dim is None:
        return False
    if a.dim == 0 and b.dim == 0:
        return False  # point interiors are the points themselves
    if a.dim > b.dim:
        a, b = b, a
    if b.dim == 2:
        if a.dim == 2:
            ra, rb = a.region(), b.region()
            return (
                intersects(a, b)
                and region_area(overlay(ra, rb, "and")) <= _area_eps(ra, rb)
            )
        if a.dim == 0:
            p = a.points()
            on = _on_edges(p[:, 0], p[:, 1], b.edges())
            return bool(on.any() and not _pts_strict(p, b).any())
        total, inside, any_int, any_ext = _line_pieces_in(b, a)
        return intersects(a, b) and not any_int
    if a.dim == 0:  # point x line
        p = a.points()
        on = _on_edges(p[:, 0], p[:, 1], b.edges())
        if not on.any():
            return False
        term = b.terminals()
        return all(tuple(q) in term for q in p[on])
    # line x line: every contact at a terminal endpoint of at least one
    has, dim1, contacts = _line_contacts(a, b)
    if not has or dim1:
        return False
    ta, tb = a.terminals(), b.terminals()
    return all(c in ta or c in tb for c in contacts)


def crosses(a: Geometry, b: Geometry) -> bool:
    _gc_guard(a, b, "Crosses")
    if a.dim is None or b.dim is None:
        return False
    if a.dim == 2 and b.dim == 2:
        return False
    if a.dim == b.dim == 0:
        return False
    if a.dim > b.dim:
        a, b = b, a
    if b.dim == 2:
        if a.dim == 0:  # multipoint: some strictly in, some strictly out
            p = a.points()
            strict = _pts_strict(p, b)
            outside = ~_pts_closed(p, b)
            return bool(strict.any() and outside.any())
        total, inside, any_int, any_ext = _line_pieces_in(b, a)
        return any_int and any_ext
    if a.dim == 0:  # point x line
        p = a.points()
        on = _on_edges(p[:, 0], p[:, 1], b.edges())
        term = b.terminals()
        interior_hit = any(tuple(q) not in term for q in p[on])
        return bool(interior_hit and (~on).any())
    # line x line: an interior-interior point contact, no 1D overlap
    has, dim1, contacts = _line_contacts(a, b)
    if not has or dim1:
        return False
    ta, tb = a.terminals(), b.terminals()
    return any(c not in ta and c not in tb for c in contacts)


def overlaps(a: Geometry, b: Geometry) -> bool:
    _gc_guard(a, b, "Overlaps")
    if a.dim is None or b.dim is None or a.dim != b.dim:
        return False
    if a.dim == 2:
        ra, rb = a.region(), b.region()
        eps = _area_eps(ra, rb)
        return (
            region_area(overlay(ra, rb, "and")) > eps
            and region_area(overlay(ra, rb, "a_not_b")) > eps
            and region_area(overlay(ra, rb, "b_not_a")) > eps
        )
    if a.dim == 0:
        sa = {tuple(p) for p in a.points()}
        sb = {tuple(p) for p in b.points()}
        return bool(sa & sb) and bool(sa - sb) and bool(sb - sa)
    # line x line: share a 1D stretch, neither within the other
    has, dim1, _ = _line_contacts(a, b)
    return dim1 and not within(a, b) and not within(b, a)


def equals(a: Geometry, b: Geometry) -> bool:
    _gc_guard(a, b, "Equals")
    if a.dim is None or b.dim is None or a.dim != b.dim:
        return False
    if a.dim == 2:
        ra, rb = a.region(), b.region()
        return region_area(overlay(ra, rb, "xor")) <= _area_eps(ra, rb)
    if a.dim == 0:
        return {tuple(p) for p in a.points()} == {tuple(p) for p in b.points()}
    return within(a, b) and within(b, a)


PREDICATES = {
    "intersects": intersects,
    "disjoint": disjoint,
    "within": within,
    "contains": contains,
    "touches": touches,
    "crosses": crosses,
    "overlaps": overlaps,
    "equals": equals,
}
