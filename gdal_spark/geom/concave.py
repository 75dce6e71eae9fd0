"""Concave hull by edge-length ratio — the published JTS/GEOS
ConcaveHull algorithm (org.locationtech.jts.algorithm.hull.ConcaveHull,
what OGRGeometry::ConcaveHull delegates to for
`gdal vector concave-hull`, apps/gdalalg_vector_concave_hull.cpp):

  1. Delaunay triangulation of the input points (geom/delaunay.py).
  2. target edge length = min + ratio * (max - min) over ALL
     triangulation edge lengths (ratio 1 -> convex hull, 0 -> maximum
     concaveness).
  3. Border erosion: repeatedly remove the border triangle whose
     longest border edge is the globally longest, while that edge is
     longer than the target and removal keeps the region simply
     connected (a triangle with one border edge is removable only if
     its opposite vertex is not already on the border; an ear — two
     border edges — is always removable).
  4. allow_holes: after border erosion, interior triangles whose
     longest edge exceeds the target seed holes, eroded with the same
     rules against the hole boundary.

Own-written over numpy; parity with GEOS is algorithmic (same
published erosion rules), not bitwise — triangulation tie-breaks may
differ on cocircular inputs.
"""

from __future__ import annotations

import heapq

import numpy as np

from gdal_spark.geom.delaunay import delaunay


def _edge_len2(pts, a, b) -> float:
    d = pts[a] - pts[b]
    return float(d[0] * d[0] + d[1] * d[1])


def concave_hull(
    points: np.ndarray, ratio: float = 0.5, allow_holes: bool = False
) -> list[np.ndarray] | None:
    """Returns the hull as rings [shell, hole...] (closed (k,2)
    arrays, shell CCW / holes CW), or None for degenerate input
    (<3 non-collinear points)."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    tris = delaunay(pts)
    if not len(tris):
        return None
    # normalize CCW
    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    cw = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]) < 0
    tris[cw] = tris[cw][:, [0, 2, 1]]

    # edge -> triangle adjacency (undirected key)
    tri_edges = {}  # frozen edge key -> [tri ids]
    alive = set(range(len(tris)))

    def ekey(u, v):
        return (u, v) if u < v else (v, u)

    for t, (u, v, w) in enumerate(tris):
        for e in ((u, v), (v, w), (w, u)):
            tri_edges.setdefault(ekey(*e), []).append(t)

    all_len = [np.sqrt(_edge_len2(pts, u, v)) for (u, v) in tri_edges]
    lo, hi = min(all_len), max(all_len)
    target = lo + float(ratio) * (hi - lo)

    def border_edges_of(t):
        u, v, w = tris[t]
        out = []
        for e in ((u, v), (v, w), (w, u)):
            owners = [x for x in tri_edges[ekey(*e)] if x in alive]
            if len(owners) == 1:
                out.append(e)
        return out

    def border_vertices():
        bv = set()
        for t in alive:
            for (u, v) in border_edges_of(t):
                bv.add(u)
                bv.add(v)
        return bv

    bverts = border_vertices()

    def removable(t):
        # JTS isRemovableBorder: EXACTLY one border edge, and the
        # opposite vertex interior. Ears (two border edges) are NOT
        # removable — removing one would expel its apex vertex, and
        # the concave hull must contain every input point.
        be = border_edges_of(t)
        if len(be) != 1:
            return False
        u, v = be[0]
        opp = [x for x in tris[t] if x != u and x != v][0]
        return opp not in bverts

    def size(t):
        be = border_edges_of(t)
        if not be:
            return -1.0
        return max(np.sqrt(_edge_len2(pts, u, v)) for (u, v) in be)

    heap = [(-size(t), t) for t in alive if border_edges_of(t)]
    heapq.heapify(heap)
    while heap:
        neg, t = heapq.heappop(heap)
        if t not in alive:
            continue
        s = size(t)
        if s <= target or s < 0:
            continue
        if abs(-neg - s) > 1e-12:  # stale entry: re-queue with current size
            heapq.heappush(heap, (-s, t))
            continue
        if not removable(t):
            continue
        if len(alive) == 1:
            break
        # remove; neighbors across former interior edges become border
        alive.discard(t)
        u, v, w = tris[t]
        for e in ((u, v), (v, w), (w, u)):
            for n in tri_edges[ekey(*e)]:
                if n in alive:
                    heapq.heappush(heap, (-size(n), n))
        bverts = border_vertices()

    if allow_holes:
        # JTS holes mode: seed a hole from an interior triangle whose
        # longest edge exceeds the target and whose vertices are all
        # interior (hole boundaries stay disjoint from the shell and
        # from each other), then let normal border erosion grow it
        while True:
            seed = None
            for t in sorted(alive):
                if border_edges_of(t):
                    continue
                u, v, w = tris[t]
                longest = max(
                    np.sqrt(_edge_len2(pts, *e)) for e in ((u, v), (v, w), (w, u))
                )
                if longest > target and all(x not in bverts for x in tris[t]) and len(alive) > 1:
                    seed = t
                    break
            if seed is None:
                break
            alive.discard(seed)
            bverts = border_vertices()
            heap = [(-size(t), t) for t in alive if border_edges_of(t)]
            heapq.heapify(heap)
            while heap:
                neg, t = heapq.heappop(heap)
                if t not in alive:
                    continue
                s = size(t)
                if s <= target or s < 0:
                    continue
                if abs(-neg - s) > 1e-12:
                    heapq.heappush(heap, (-s, t))
                    continue
                if not removable(t) or len(alive) == 1:
                    continue
                alive.discard(t)
                u, v, w = tris[t]
                for e in ((u, v), (v, w), (w, u)):
                    for nb in tri_edges[ekey(*e)]:
                        if nb in alive:
                            heapq.heappush(heap, (-size(nb), nb))
                bverts = border_vertices()

    # trace boundary loops: directed border edges (interior on the
    # left for CCW triangles)
    succ: dict[int, list[int]] = {}
    edges = []
    for t in alive:
        u, v, w = tris[t]
        for e in ((u, v), (v, w), (w, u)):
            owners = [x for x in tri_edges[ekey(*e)] if x in alive]
            if len(owners) == 1:
                edges.append(e)
                succ.setdefault(e[0], []).append(e[1])
    if not edges:
        return None
    used = set()
    loops = []
    for e0 in edges:
        if e0 in used:
            continue
        loop = [e0[0]]
        cur = e0
        while True:
            used.add(cur)
            loop.append(cur[1])
            nxts = [x for x in succ.get(cur[1], []) if (cur[1], x) not in used]
            if not nxts:
                break
            cur = (cur[1], nxts[0])
            if cur[1] == loop[0] and len(nxts) == 1:
                pass
            if loop[-1] == loop[0]:
                break
        if loop[0] == loop[-1] and len(loop) > 3:
            loops.append(np.asarray(pts[loop]))
    if not loops:
        return None

    def ring_area(r):
        x, y = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        return 0.5 * float(np.sum(x * y2 - x2 * y))

    loops.sort(key=lambda r: -abs(ring_area(r)))
    shell = loops[0]
    if ring_area(shell) < 0:
        shell = shell[::-1]
    out = [shell]
    for h in loops[1:]:
        if ring_area(h) > 0:
            h = h[::-1]
        out.append(h)
    return out
