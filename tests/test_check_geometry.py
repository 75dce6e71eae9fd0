"""check-geometry (gdalalg_vector_check_geometry.cpp →
GEOSisValidDetail / isSimpleDetail analogs): every reason with its
invalid location, plus the Spark layer shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.operators.check_geometry import (
    check_geometry,
    check_line_simple,
    check_polygon,
)


def rings(*pts_lists):
    return [np.array(p, dtype=float) for p in pts_lists]


class TestPolygonValidity:
    def test_valid(self):
        assert check_polygon([rings([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)])]) is None
        # valid with hole touching shell at ONE point (allowed)
        ok = rings(
            [(0, 0), (8, 0), (8, 8), (0, 8), (0, 0)],
            [(0, 0), (2, 1), (1, 2), (0, 0)],
        )
        assert check_polygon([ok]) is None

    def test_bowtie_proper_crossing(self):
        got = check_polygon([rings([(0, 0), (4, 2), (4, 0), (0, 2), (0, 0)])])
        assert got == ("Self-intersection", 2.0, 1.0)

    def test_pinch_touch(self):
        got = check_polygon(
            [rings([(0, 0), (2, 2), (4, 0), (4, 4), (2, 2), (0, 4), (0, 0)])]
        )
        assert got == ("Ring Self-intersection", 2.0, 2.0)

    def test_hole_outside_shell(self):
        got = check_polygon(
            [rings([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
                   [(10, 10), (11, 10), (11, 11), (10, 11), (10, 10)])]
        )
        assert got == ("Hole lies outside shell", 10.0, 10.0)

    def test_nested_holes(self):
        got = check_polygon(
            [rings([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
                   [(1, 1), (9, 1), (9, 9), (1, 9), (1, 1)],
                   [(2, 2), (3, 2), (3, 3), (2, 3), (2, 2)])]
        )
        assert got == ("Holes are nested", 2.0, 2.0)

    def test_duplicate_rings(self):
        h = [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]
        got = check_polygon(
            [rings([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], h, h)]
        )
        assert got == ("Duplicate Rings", 1.0, 1.0)

    def test_nested_shells(self):
        got = check_polygon(
            [rings([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]),
             rings([(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)])]
        )
        assert got == ("Nested shells", 1.0, 1.0)

    def test_shell_inside_hole_is_valid(self):
        # donut + island inside the hole: valid multipolygon
        got = check_polygon(
            [rings([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
                   [(2, 2), (8, 2), (8, 8), (2, 8), (2, 2)]),
             rings([(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)])]
        )
        assert got is None

    def test_too_few_points_and_bad_coord(self):
        got = check_polygon([rings([(0, 0), (1, 1), (0, 0)])])
        assert got[0] == "Too few points in geometry component"
        got = check_polygon([rings([(0, 0), (4, 0), (np.nan, 4), (0, 4), (0, 0)])])
        assert got[0] == "Invalid Coordinate"

    def test_hole_crossing_shell(self):
        got = check_polygon(
            [rings([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
                   [(2, 2), (6, 2), (6, 3), (2, 3), (2, 2)])]
        )
        assert got[0] == "Self-intersection"


class TestLineSimplicity:
    def test_simple_and_closed(self):
        assert check_line_simple([np.array([(0, 0), (4, 4), (8, 0)], float)]) is None
        assert check_line_simple([np.array([(0, 0), (4, 0), (4, 4), (0, 0)], float)]) is None

    def test_self_cross(self):
        got = check_line_simple([np.array([(0, 0), (4, 4), (4, 0), (0, 4)], float)])
        assert got == (2.0, 2.0)

    def test_cross_between_members(self):
        got = check_line_simple(
            [np.array([(0, 0), (4, 4)], float), np.array([(0, 4), (4, 0)], float)]
        )
        assert got == (2.0, 2.0)

    def test_repeated_interior_vertex(self):
        got = check_line_simple([np.array([(0, 0), (2, 2), (4, 0), (2, 2), (5, 5)], float)])
        assert got == (2.0, 2.0)


class TestSparkLayer:
    def test_layer_shape(self, spark):
        df = spark.createDataFrame(
            [
                (1, "POLYGON ((0 0,4 2,4 0,0 2,0 0))"),
                (2, "POLYGON ((0 0,4 0,4 4,0 4,0 0))"),
                (3, "POINT (1 2)"),
                (4, None),
                (5, "LINESTRING (0 0,4 4,4 0,0 4)"),
                (6, "garbage"),
            ],
            "doc_id long, wkt string",
        )
        rows = {r["id"]: r for r in check_geometry(df).collect()}
        assert set(rows) == {1.0, 5.0, 6.0}
        assert rows[1.0]["error"] == "Self-intersection"
        assert (rows[1.0]["loc_x"], rows[1.0]["loc_y"]) == (2.0, 1.0)
        assert rows[5.0]["error"] == "self-intersection"
        assert "unparseable" in rows[6.0]["error"]
