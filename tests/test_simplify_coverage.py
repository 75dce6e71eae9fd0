"""simplify-coverage (gdalalg_vector_simplify_coverage.cpp, JTS
CoverageSimplifier semantics)."""

from __future__ import annotations

import numpy as np

from gdal_spark.geom.coverage_simplify import coverage_simplify, vw_simplify_chain
from gdal_spark.operators.coverage import simplify_coverage


def ring(*pts):
    return np.array(list(pts) + [pts[0]], float)


def ring_area(r):
    x, y = r[:-1, 0], r[:-1, 1]
    x2, y2 = r[1:, 0], r[1:, 1]
    return 0.5 * float(np.sum(x * y2 - x2 * y))


class TestVW:
    def test_collinear_removed_any_tolerance(self):
        c = np.array([(0, 0), (5, 0), (10, 0)], float)
        assert len(vw_simplify_chain(c, 0.001)) == 2

    def test_area_threshold_is_tol_squared(self):
        # deviation point (5, 1): triangle area = 5
        c = np.array([(0, 0), (5, 1), (10, 0)], float)
        assert len(vw_simplify_chain(c, 2.0)) == 3  # 5 >= 4 kept
        assert len(vw_simplify_chain(c, 2.3)) == 2  # 5 < 5.29 dropped

    def test_endpoints_pinned(self):
        c = np.array([(0, 0), (1, 0.001), (2, 0)], float)
        out = vw_simplify_chain(c, 10.0)
        assert (out[0] == c[0]).all() and (out[-1] == c[-1]).all()


class TestCoverage:
    def test_shared_chain_identical_both_sides(self):
        A = [ring((0, 0), (10, 0), (10, 5), (10.4, 6), (10, 7), (10, 10), (0, 10))]
        B = [ring((10, 0), (20, 0), (20, 10), (10, 10), (10, 7), (10.4, 6), (10, 5))]
        out = coverage_simplify([A, B], tolerance=3.0)
        a_shared = {tuple(p) for p in out[0][0] if p[0] >= 10}
        b_shared = {tuple(p) for p in out[1][0] if p[0] <= 10.4}
        assert a_shared == b_shared
        # areas complementary: total preserved
        assert abs(ring_area(out[0][0]) + ring_area(out[1][0]) - 200.0) < 1e-9

    def test_preserve_boundary(self):
        C = [ring((0, 0), (5, 0), (10, 0), (10, 10), (0, 10))]
        assert len(coverage_simplify([C], 1.0)[0][0]) == 5
        assert len(coverage_simplify([C], 1.0, preserve_boundary=True)[0][0]) == 6

    def test_t_junction_nodes_pinned(self):
        # three squares meeting at T-nodes: corners must survive any tolerance
        A = [ring((0, 0), (10, 0), (10, 10), (0, 10))]
        B = [ring((10, 0), (20, 0), (20, 10), (10, 10))]
        # valid coverages are vertex-matched: C carries the T-node too
        C = [ring((0, 10), (10, 10), (20, 10), (20, 20), (0, 20))]
        out = coverage_simplify([A, B, C], tolerance=100.0)
        # (10, 10) is a 3-way node: present in all three rings
        for rr in out:
            pts = {tuple(p) for p in rr[0]}
            assert (10.0, 10.0) in pts


class TestSpark:
    def test_operator(self, spark):
        df = spark.createDataFrame(
            [(0, "POLYGON ((0 0,10 0,10 5,10 10,0 10,0 5,0 0))"),
             (1, "POLYGON ((10 0,20 0,20 5,20 10,10 10,10 5,10 0))")],
            "fid long, wkt string",
        )
        rows = {r["fid"]: r["wkt"] for r in simplify_coverage(df, 1.0).collect()}
        assert rows[0].count(",") == 4 and rows[1].count(",") == 4
