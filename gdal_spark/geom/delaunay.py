"""Delaunay triangulation (Bowyer-Watson with a ghost vertex) in numpy.

The reference delegates to qhull (alg/delaunay.c / internal libqhull)
for GGA_Linear gridding; this is a from-scratch incremental
Bowyer-Watson. The classic finite "super-triangle" variant is WRONG
near the hull: a nearly-collinear boundary triple has a circumcircle
far larger than any finite bounding triangle, so the super vertices
land inside it and the true hull triangle never forms (observed as
the triangle union under-covering the convex hull). Instead the
outside is modeled by ONE ghost vertex at infinity ("ghost triangles",
the scheme triangle/CGAL use): a ghost triangle (u, v, G) stands for
the half-plane right of directed hull edge (u, v), and its in-circle
test is the exact orient2d limit of a circumcircle through a point at
infinity. The union of finite triangles is then exactly the convex
hull — property-tested.

Degeneracies: duplicate points are dropped; fully-collinear input
yields no triangles (callers fall back to nearest/nodata).
O(n^2) worst case — fine for the broadcastable point sets the
gridding contract prescribes (the reference also holds all points in
memory for triangulation).
"""

from __future__ import annotations

import numpy as np


def _circumcircle(ax, ay, bx, by, cx, cy):
    """(ux, uy, r2) of the circumcircle; r2=inf for degenerate."""
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return 0.0, 0.0, np.inf
    a2 = ax * ax + ay * ay
    b2 = bx * bx + by * by
    c2 = cx * cx + cy * cy
    ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
    uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return ux, uy, r2


def _orient(ax, ay, bx, by, px, py) -> float:
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def delaunay(points: np.ndarray) -> np.ndarray:
    """(n, 2) points -> (t, 3) vertex-index triangles (CCW; indices
    refer to the original array's first occurrence of each unique
    point)."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    uniq, first_idx = np.unique(pts, axis=0, return_index=True)
    order = np.argsort(first_idx)
    idx_map = first_idx[order]  # unique points in first-occurrence order
    p = pts[idx_map]
    n = len(p)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)

    G = -1  # the ghost vertex (point at infinity)

    # initial triangle: first point pair + first non-collinear third
    k = 2
    while k < n and _orient(*p[0], *p[1], *p[k]) == 0.0:
        k += 1
    if k == n:
        return np.empty((0, 3), dtype=np.int64)  # all collinear
    i0, i1, i2 = 0, 1, k
    if _orient(*p[i0], *p[i1], *p[i2]) < 0:
        i1, i2 = i2, i1
    tris: list[tuple[int, int, int]] = [
        (i0, i1, i2),
        (i1, i0, G),  # ghost behind each hull edge (reversed = outside)
        (i2, i1, G),
        (i0, i2, G),
    ]
    circ: list[tuple[float, float, float]] = [
        _circumcircle(*p[i0], *p[i1], *p[i2]),
        (0.0, 0.0, -1.0),
        (0.0, 0.0, -1.0),
        (0.0, 0.0, -1.0),
    ]

    inserted = {i0, i1, i2}
    for i in range(n):
        if i in inserted:
            continue
        px, py = p[i]
        bad = []
        for t, tri in enumerate(tris):
            if tri[2] == G:
                # ghost (u, v, G): in-circle limit = p STRICTLY left
                # of the reversed hull edge (u, v). Strict matters: a
                # point collinear-beyond a hull edge is strictly
                # visible from an adjacent (turning) hull edge and
                # inserts there; opening the collinear ghost instead
                # fans a zero-area triangle whose inf circumcircle
                # poisons every later cavity (the 5x5-lattice blowup)
                u, v = tri[0], tri[1]
                if _orient(*p[u], *p[v], px, py) > 0.0:
                    bad.append(t)
            else:
                ux, uy, r2 = circ[t]
                # STRICT in-circle: exactly-cocircular points (integer
                # lattices) must NOT invalidate the triangle — an
                # inclusive test there grows a non-star-shaped cavity
                # whose re-fan overlaps (observed: 5x5 lattice union
                # area 46 instead of 16)
                if (px - ux) ** 2 + (py - uy) ** 2 < r2 * (1 - 1e-12):
                    bad.append(t)
        # p exactly ON a hull edge segment: the finite triangle behind
        # is bad (chord interior is strictly in-circle) but the
        # collinear ghost is not — fanning would create a degenerate
        # (u, v, p). Open such ghosts so the hull edge splits cleanly.
        bad_set = set(bad)
        for t, tri in enumerate(tris):
            if tri[2] != G or t in bad_set:
                continue
            u, v = tri[0], tri[1]
            if _orient(*p[u], *p[v], px, py) == 0.0:
                for tb in bad_set:
                    a, b, c = tris[tb]
                    if c != G and ((u, v) in ((b, a), (c, b), (a, c))):
                        bad.append(t)
                        bad_set.add(t)
                        break
        # cavity boundary = edges of bad triangles not shared by two bad
        edge_count: dict[tuple[int, int], int] = {}
        edge_dir: dict[tuple[int, int], tuple[int, int]] = {}
        for t in bad:
            a, b, c = tris[t]
            for u, v in ((a, b), (b, c), (c, a)):
                kk = (u, v) if u < v else (v, u)
                edge_count[kk] = edge_count.get(kk, 0) + 1
                edge_dir[kk] = (u, v)
        for t in sorted(bad, reverse=True):
            tris.pop(t)
            circ.pop(t)
        for kk, cnt in edge_count.items():
            if cnt == 1:
                u, v = edge_dir[kk]
                tri = (u, v, i)
                # rotate so the ghost sits at index 2 (rotation keeps
                # the cyclic orientation; the in-circle dispatch and
                # the hull-edge convention read positions 0-2)
                if u == G:
                    tri = (v, i, G)
                elif v == G:
                    tri = (i, u, G)
                tris.append(tri)
                if tri[2] == G:
                    circ.append((0.0, 0.0, -1.0))
                else:
                    circ.append(_circumcircle(*p[u], *p[v], *p[i]))

    out = [t for t in tris if G not in t]
    if not out:
        return np.empty((0, 3), dtype=np.int64)
    arr = np.asarray(out, dtype=np.int64)
    return idx_map[arr]  # back to original-input indexing
