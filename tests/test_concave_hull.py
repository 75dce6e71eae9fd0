"""Concave hull (JTS/GEOS edge-length-ratio erosion, the
gdal vector concave-hull kernel) + the rewritten ghost-vertex
Delaunay it runs on."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.geom.concave import concave_hull
from gdal_spark.geom.delaunay import delaunay
from gdal_spark.geom.predicates import points_in_edges, rings_to_edges


def ring_area(r):
    x, y = r[:-1, 0], r[:-1, 1]
    x2, y2 = r[1:, 0], r[1:, 1]
    return 0.5 * float(np.sum(x * y2 - x2 * y))


def convex_hull_area(pts):
    P = sorted(map(tuple, pts))

    def half(P):
        h = []
        for q in P:
            while len(h) >= 2 and (h[-1][0] - h[-2][0]) * (q[1] - h[-2][1]) - (
                h[-1][1] - h[-2][1]
            ) * (q[0] - h[-2][0]) <= 0:
                h.pop()
            h.append(q)
        return h

    lo, hi = half(P), half(P[::-1])
    ring = lo[:-1] + hi[:-1]
    a = 0.0
    for i in range(len(ring)):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % len(ring)]
        a += x1 * y2 - x2 * y1
    return abs(a) / 2


class TestDelaunay:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_covers_convex_hull_exactly(self, seed):
        rng = np.random.default_rng(seed)
        pts = rng.uniform(0, 100, size=(60 + 31 * seed, 2))
        if seed % 2 == 0:
            pts = np.vstack([pts, [[0, 0], [100, 0], [100, 100], [0, 100]]])
        tris = delaunay(pts)
        a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
        cross = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (
            c[:, 0] - a[:, 0]
        )
        assert (cross > 0).all()  # all CCW, none degenerate
        assert abs(0.5 * np.abs(cross).sum() - convex_hull_area(pts)) < 1e-6

    def test_integer_lattice(self):
        # exactly-cocircular quads everywhere: the failure mode of the
        # old finite-super-triangle implementation (area 46 vs 16)
        g = np.array([[x, y] for x in range(5) for y in range(5)], float)
        tris = delaunay(g)
        assert len(tris) == 32
        a, b, c = g[tris[:, 0]], g[tris[:, 1]], g[tris[:, 2]]
        cross = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (
            c[:, 0] - a[:, 0]
        )
        assert (cross > 0).all()
        assert abs(0.5 * cross.sum() - 16.0) < 1e-12

    def test_empty_circumcircle_property(self):
        rng = np.random.default_rng(5)
        pts = rng.uniform(0, 10, size=(80, 2))
        from gdal_spark.geom.delaunay import _circumcircle

        for (i, j, k) in delaunay(pts):
            ux, uy, r2 = _circumcircle(*pts[i], *pts[j], *pts[k])
            d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
            inside = d2 < r2 * (1 - 1e-9)
            inside[[i, j, k]] = False
            assert not inside.any()

    def test_degenerates(self):
        assert len(delaunay(np.array([[0, 0], [1, 1], [2, 2]], float))) == 0
        assert len(delaunay(np.array([[0, 0], [1, 0]], float))) == 0


class TestConcaveHull:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.pts = np.vstack(
            [rng.uniform(0, 100, size=(60, 2)), [[0, 0], [100, 0], [100, 100], [0, 100]]]
        )

    def test_ratio1_is_convex_hull(self):
        h = concave_hull(self.pts, 1.0)
        assert len(h) == 1
        assert abs(ring_area(h[0]) - 10000.0) < 1e-9
        assert len(h[0]) - 1 == 4

    def test_contains_all_points_at_every_ratio(self):
        for r in (1.0, 0.5, 0.2, 0.05, 0.0):
            h = concave_hull(self.pts, r)
            edges = rings_to_edges([h[0]])
            assert points_in_edges(self.pts[:, 0], self.pts[:, 1], edges).all(), r

    def test_area_monotone_in_ratio(self):
        areas = [ring_area(concave_hull(self.pts, r)[0]) for r in (0.0, 0.2, 0.5, 1.0)]
        assert areas == sorted(areas)

    def test_c_shape_concavity(self):
        theta = np.linspace(0.3, 2 * np.pi - 0.3, 40)
        pts = np.vstack(
            [
                np.column_stack([np.cos(theta) * 10, np.sin(theta) * 10]),
                np.column_stack([np.cos(theta) * 7, np.sin(theta) * 7]),
            ]
        )
        concave = ring_area(concave_hull(pts, 0.12)[0])
        convex = ring_area(concave_hull(pts, 1.0)[0])
        assert concave < 0.6 * convex

    def test_allow_holes_donut(self):
        rng = np.random.default_rng(2)
        ang = rng.uniform(0, 2 * np.pi, 300)
        rad = rng.uniform(6, 10, 300)
        pts = np.column_stack([np.cos(ang) * rad, np.sin(ang) * rad])
        hh = concave_hull(pts, 0.2, allow_holes=True)
        assert len(hh) >= 2
        assert ring_area(hh[1]) < 0  # hole CW
        assert len(concave_hull(pts, 0.2, allow_holes=False)) == 1

    def test_degenerate_returns_none(self):
        assert concave_hull(np.array([[0, 0], [1, 1], [2, 2]], float), 0.5) is None


class TestSparkOperator:
    def test_operator(self, spark):
        from gdal_spark.operators.vector_translate import concave_hull_geom

        df = spark.createDataFrame(
            [
                (1, "MULTIPOINT (0 0,4 0,4 4,0 4,2 2)"),
                (2, "MULTIPOINT (0 0,1 1,2 2)"),  # collinear -> NULL
                (3, None),
            ],
            "doc_id long, wkt string",
        )
        rows = {r["doc_id"]: r["wkt"] for r in concave_hull_geom(df, ratio=1.0).collect()}
        assert rows[1] is not None and rows[1].startswith("POLYGON")
        assert "2 2" not in rows[1]  # interior point not a hull vertex
        assert rows[2] is None and rows[3] is None
