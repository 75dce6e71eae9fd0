"""OGRGeometryFactory::forceTo for the linear geometry lattice
(ogr/ogrgeometryfactory.cpp:5229 dispatch + the forceTo{LineString
:forceToLineString, Polygon, MultiPoint, MultiLineString, MultiPolygon}
helpers). Curve/TIN/PolyhedralSurface inputs reach this module already
linearized / normalized by the WKT parser (geom/wkt.py:50), so the
curve-specific dispatch branches collapse to their linear shadows.

Geometry representation: (gtype, members) where members is a list of
(atomic_type, rings_list) pairs — one pair per container part / the
geometry itself when atomic. rings_list is a list of (N,2) float64
arrays (first exterior for polygons). Empty geometries are (gtype, []).
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geom.batch import GeomType

ATOMIC = frozenset((GeomType.POINT, GeomType.LINESTRING, GeomType.POLYGON))
COLLECTION_OF = {
    GeomType.POINT: GeomType.MULTIPOINT,
    GeomType.LINESTRING: GeomType.MULTILINESTRING,
    GeomType.POLYGON: GeomType.MULTIPOLYGON,
}
GC = GeomType.GEOMETRYCOLLECTION

Members = list  # list[tuple[GeomType, list[np.ndarray]]]


def _closed_ring(coords: np.ndarray) -> bool:
    # get_IsClosed + getNumPoints() >= 3 (forceToPolygon curve branch)
    return len(coords) >= 3 and bool(np.all(coords[0] == coords[-1]))


def _to_linestring(gtype: GeomType, members: Members):
    """forceToLineString (ogrgeometryfactory.cpp): single-ring polygon
    -> its exterior ring; MLS/GC -> in-order endpoint merge loop, the
    single survivor escapes the container, otherwise the (merged)
    container is returned unchanged-typed."""
    if gtype == GeomType.POLYGON:
        rings = members[0][1]
        if len(rings) == 1:
            return GeomType.LINESTRING, [(GeomType.LINESTRING, [rings[0]])]
        return gtype, members
    if gtype not in (GeomType.MULTILINESTRING, GC):
        return gtype, members
    ms = list(members)
    i0 = 0
    while i0 < len(ms):
        mt0, r0 = ms[i0]
        if mt0 != GeomType.LINESTRING or len(r0[0]) < 2:
            i0 += 1
            continue
        line0 = r0[0]
        merged = False
        for i1 in range(i0 + 1, len(ms)):
            mt1, r1 = ms[i1]
            if mt1 != GeomType.LINESTRING or len(r1[0]) < 2:
                continue
            line1 = r1[0]
            if np.all(line0[-1] == line1[0]):
                ms[i0] = (GeomType.LINESTRING, [np.concatenate([line0, line1[1:]])])
                del ms[i1]
                merged = True
                break
            if np.all(line1[-1] == line0[0]):
                ms[i1] = (GeomType.LINESTRING, [np.concatenate([line1, line0[1:]])])
                del ms[i0]
                merged = True
                break
        if not merged:
            i0 += 1
    if len(ms) == 1:
        mt, rings = ms[0]
        return mt, [(mt, rings)]
    return gtype, ms


def _to_polygon(gtype: GeomType, members: Members):
    """forceToPolygon: closed >=3-point line -> one-ring polygon;
    MULTIPOLYGON/GC -> ONE polygon aggregating every ring of every
    polygon member (ring-less / non-polygon members skipped)."""
    if gtype == GeomType.LINESTRING:
        line = members[0][1][0]
        if _closed_ring(line):
            return GeomType.POLYGON, [(GeomType.POLYGON, [line])]
        return gtype, members
    if gtype not in (GC, GeomType.MULTIPOLYGON):
        return gtype, members
    agg: list[np.ndarray] = []
    for mt, rings in members:
        if mt == GeomType.POLYGON and rings:
            agg.extend(rings)
    if not agg:
        return GeomType.POLYGON, []
    return GeomType.POLYGON, [(GeomType.POLYGON, agg)]


def _to_multipolygon(gtype: GeomType, members: Members):
    """forceToMultiPolygon: GC promotes only when every member is
    polygonal; anything else returns unchanged."""
    if gtype == GC and all(mt == GeomType.POLYGON for mt, _ in members):
        return GeomType.MULTIPOLYGON, members
    return gtype, members


def _to_multilinestring(gtype: GeomType, members: Members):
    """forceToMultiLineString: GC of lines promotes; POLYGON /
    MULTIPOLYGON convert to one linestring per non-empty ring."""
    if gtype == GC and all(mt == GeomType.LINESTRING for mt, _ in members):
        return GeomType.MULTILINESTRING, members
    if gtype in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
        out = [
            (GeomType.LINESTRING, [ring])
            for _, rings in members
            for ring in rings
            if len(ring)
        ]
        return GeomType.MULTILINESTRING, out
    return gtype, members


def _to_multipoint(gtype: GeomType, members: Members):
    if gtype == GC and all(mt == GeomType.POINT for mt, _ in members):
        return GeomType.MULTIPOINT, members
    return gtype, members


def force_to(gtype: GeomType, members: Members, target: GeomType):
    """forceTo dispatch (ogrgeometryfactory.cpp:5229) on the linear
    lattice. Returns (new_gtype, new_members); a conversion the
    reference leaves undone returns the input unchanged (callers — the
    set-geom-type skip option — compare types to decide)."""
    if target == GeomType.UNKNOWN:
        return gtype, members
    if not members:
        # empty -> empty of the target type (:5240-5251)
        return target, []
    if gtype == target:
        return gtype, members
    if gtype in ATOMIC:
        # wrap into the matching collection / a GEOMETRYCOLLECTION
        # (:5479-5494 GetCollection-subclass branch)
        if target in (COLLECTION_OF[gtype], GC):
            return target, members
        if gtype == GeomType.LINESTRING and target == GeomType.MULTIPOLYGON:
            # route via POLYGON, then retry (:5524-5545 bIsCurve branch)
            t2, m2 = _to_polygon(gtype, members)
            if t2 != gtype:
                return force_to(t2, m2, target)
    else:
        if target == GC:
            # CastToGeometryCollection (:5290-5300); note the repo's
            # parse normalizes GC members to atomics, so a MULTI input
            # contributes its parts as individual members
            return GC, members
        if len(members) == 1:
            # single-member collection recurses into the member (:5594)
            mt, rings = members[0]
            t2, m2 = force_to(mt, [(mt, rings)], target)
            if t2 == target:
                return t2, m2
    if target == GeomType.LINESTRING:
        return _to_linestring(gtype, members)
    if target == GeomType.POLYGON:
        return _to_polygon(gtype, members)
    if target == GeomType.MULTIPOLYGON:
        return _to_multipolygon(gtype, members)
    if target == GeomType.MULTILINESTRING:
        return _to_multilinestring(gtype, members)
    if target == GeomType.MULTIPOINT:
        return _to_multipoint(gtype, members)
    return gtype, members
