"""check-coverage (gdalalg_vector_check_coverage.cpp, GEOS
CoverageValidator interior-intersection rule)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.operators.cells import Grid
from gdal_spark.operators.coverage import check_coverage, invalid_boundary_pieces


def sq(x0, y0, x1, y1):
    return [np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], float)]


class TestKernel:
    def test_shared_edge_valid(self):
        assert invalid_boundary_pieces(sq(0, 0, 10, 10), sq(10, 0, 20, 10)) == []

    def test_overlap_flags_both_sides(self):
        a = invalid_boundary_pieces(sq(0, 0, 12, 10), sq(10, 0, 20, 10))
        assert len(a) == 1 and np.allclose(sorted(a[0][:, 1]), [0, 10])
        assert np.allclose(a[0][:, 0], 12)
        b = invalid_boundary_pieces(sq(10, 0, 20, 10), sq(0, 0, 12, 10))
        assert len(b) == 1 and np.allclose(b[0][:, 0], 10)

    def test_disjoint_and_corner_touch(self):
        assert invalid_boundary_pieces(sq(0, 0, 10, 10), sq(20, 0, 30, 10)) == []
        assert invalid_boundary_pieces(sq(0, 0, 10, 10), sq(10, 10, 20, 20)) == []

    def test_contained_polygon_fully_invalid(self):
        pieces = invalid_boundary_pieces(sq(2, 2, 4, 4), sq(0, 0, 10, 10))
        total = sum(np.hypot(*np.diff(p, axis=0).T).sum() for p in pieces)
        assert abs(total - 8.0) < 1e-9  # full 2x2 perimeter


class TestDistributed:
    def test_strip_coverage(self, spark):
        rows = []
        for i in range(20):
            w = 12 if i % 5 == 0 else 10
            x0, x1 = i * 10, i * 10 + w
            rows.append((i, f"POLYGON (({x0} 0,{x1} 0,{x1} 10,{x0} 10,{x0} 0))"))
        zones = spark.createDataFrame(rows, "fid long, wkt string")
        grid = Grid(minx=0.0, miny=0.0, maxx=500.0, maxy=10.0, nx=64, ny=1)
        got = {r["fid"]: r for r in check_coverage(zones, grid).collect()}
        want = {i for i in range(20) if (i % 5 == 0 and i < 19) or (i >= 1 and (i - 1) % 5 == 0)}
        assert set(got) == want
        for fid, r in got.items():
            assert abs(r["invalid_len"] - 10.0) < 1e-9, fid
            assert r["invalid_wkt"].startswith("LINESTRING")

    def test_include_valid(self, spark):
        zones = spark.createDataFrame(
            [(0, "POLYGON ((0 0,10 0,10 10,0 10,0 0))"),
             (1, "POLYGON ((10 0,20 0,20 10,10 10,10 0))")],
            "fid long, wkt string",
        )
        grid = Grid(minx=0.0, miny=0.0, maxx=30.0, maxy=10.0, nx=4, ny=1)
        out = check_coverage(zones, grid, include_valid=True).collect()
        assert len(out) == 2
        assert all(r["invalid_len"] == 0.0 and r["invalid_wkt"] is None for r in out)
