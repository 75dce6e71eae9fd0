"""Delaunay triangulation (Bowyer-Watson) in numpy.

The reference delegates to qhull (alg/delaunay.c / internal libqhull)
for GGA_Linear gridding; this is a from-scratch incremental
Bowyer-Watson (the textbook algorithm: insert points one at a time,
remove every triangle whose circumcircle contains the point,
re-triangulate the star-shaped cavity). O(n^2) worst case — fine for
the broadcastable point sets the gridding contract prescribes (the
reference also holds all points in memory for triangulation).

Degeneracies: duplicate points are dropped; fully-collinear input
yields no triangles (callers fall back to nearest/nodata).
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


def delaunay(points: np.ndarray) -> np.ndarray:
    """(n, 2) points -> (t, 3) vertex-index triangles (indices into the
    DEDUPED input order returned alongside is avoided: indices refer to
    the original array's first occurrence of each unique point)."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    uniq, first_idx = np.unique(pts, axis=0, return_index=True)
    order = np.argsort(first_idx)
    idx_map = first_idx[order]  # unique points in first-occurrence order
    p = pts[idx_map]
    n = len(p)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)

    # super-triangle
    cx, cy = p[:, 0].mean(), p[:, 1].mean()
    m = max(p[:, 0].ptp(), p[:, 1].ptp(), 1.0) * 20.0
    sup = np.array([[cx - m, cy - m], [cx + m, cy - m], [cx, cy + m]])
    verts = np.vstack([p, sup])
    SUP = [n, n + 1, n + 2]

    tris: list[tuple[int, int, int]] = [(SUP[0], SUP[1], SUP[2])]
    circ: list[tuple[float, float, float]] = [
        _circumcircle(*verts[SUP[0]], *verts[SUP[1]], *verts[SUP[2]])
    ]

    for i in range(n):
        px, py = p[i]
        bad = []
        for t, (ux, uy, r2) in enumerate(circ):
            if (px - ux) ** 2 + (py - uy) ** 2 <= r2 * (1 + 1e-12):
                bad.append(t)
        # cavity boundary = edges of bad triangles not shared by two bad
        edge_count: dict[tuple[int, int], int] = {}
        edge_dir: dict[tuple[int, int], tuple[int, int]] = {}
        for t in bad:
            a, b, c = tris[t]
            for u, v in ((a, b), (b, c), (c, a)):
                k = (u, v) if u < v else (v, u)
                edge_count[k] = edge_count.get(k, 0) + 1
                edge_dir[k] = (u, v)
        for t in sorted(bad, reverse=True):
            tris.pop(t)
            circ.pop(t)
        for k, cnt in edge_count.items():
            if cnt == 1:
                u, v = edge_dir[k]
                tris.append((u, v, i))
                circ.append(_circumcircle(*verts[u], *verts[v], *verts[i]))

    out = [
        t for t in tris if not any(v >= n for v in t)
    ]
    if not out:
        return np.empty((0, 3), dtype=np.int64)
    arr = np.asarray(out, dtype=np.int64)
    return idx_map[arr]  # back to original-input indexing
