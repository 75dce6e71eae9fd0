"""Pairwise predicate tests mirroring autotest/ogr/ogr_geos.py
(Touches/Crosses/Within/Contains/Overlaps fixtures) plus flat-2D
DE-9IM corner cases, and the ST_* Spark surface."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from gdal_spark.geom.relate import (
    Geometry,
    contains,
    crosses,
    equals,
    intersects,
    overlaps,
    touches,
    within,
)


def G(wkt: str) -> Geometry:
    return Geometry.from_wkt(wkt)


class TestReferenceCases:
    def test_touches_lines_shared_endpoint(self):
        # ogr_geos.py:158-171
        assert touches(G("LINESTRING(0 0, 10 10)"), G("LINESTRING(0 0, 0 10)"))
        assert not touches(
            G("LINESTRING(0 0, 10 10)"), G("POLYGON((20 20, 20 30, 30 20, 20 20))")
        )

    def test_crosses_lines(self):
        # ogr_geos.py:178-192
        assert crosses(G("LINESTRING(0 0, 10 10)"), G("LINESTRING(10 0, 0 10)"))
        assert not crosses(G("LINESTRING(0 0, 10 10)"), G("LINESTRING(0 0, 0 10)"))

    def test_within_contains_triangles(self):
        # ogr_geos.py:199-229
        g1 = G("POLYGON((0 0, 10 10, 10 0, 0 0))")
        g2 = G("POLYGON((-90 -90, -90 90, 190 -90, -90 -90))")
        assert within(g1, g2)
        assert not within(g2, g1)
        assert contains(g2, g1)
        assert not contains(g1, g2)

    def test_overlaps_contained_is_not_overlap(self):
        # ogr_geos.py overlaps: intersection equals g1 -> not overlaps
        g1 = G("POLYGON((0 0, 10 10, 10 0, 0 0))")
        g2 = G("POLYGON((-90 -90, -90 90, 190 -90, -90 -90))")
        assert not overlaps(g2, g1)


class TestTinyExtents:
    """ADVICE r2 regressions: the snap grid must adapt to small
    coordinate spans (lon/lat-scale features) instead of capping at a
    fixed 1/64-unit resolution that collapses them to zero area."""

    def test_within_tiny_nested_squares(self):
        outer = G("POLYGON((10.000 50.000,10.002 50.000,10.002 50.002,10.000 50.002,10.000 50.000))")
        inner = G(
            "POLYGON((10.0005 50.0005,10.0015 50.0005,10.0015 50.0015,10.0005 50.0015,10.0005 50.0005))"
        )
        assert within(inner, outer)
        assert contains(outer, inner)
        assert not equals(inner, outer)

    def test_equals_distant_tiny_squares_false(self):
        a = G("POLYGON((0 0,0.002 0,0.002 0.002,0 0.002,0 0))")
        b = G("POLYGON((100 100,100.002 100,100.002 100.002,100 100.002,100 100))")
        assert not equals(a, b)
        assert not intersects(a, b)

    def test_tiny_overlap_and_touch(self):
        a = G("POLYGON((0 0,0.004 0,0.004 0.004,0 0.004,0 0))")
        b = G("POLYGON((0.002 0.002,0.006 0.002,0.006 0.006,0.002 0.006,0.002 0.002))")
        c = G("POLYGON((0.004 0,0.008 0,0.008 0.004,0.004 0.004,0.004 0))")
        assert overlaps(a, b) and not touches(a, b)
        assert touches(a, c) and not overlaps(a, c)

    def test_tiny_overlay_area(self):
        from gdal_spark.geom.overlay import overlay, region_area

        sq = lambda x0, y0, s: [[__import__("numpy").array(
            [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]], dtype=float
        )]]
        inter = overlay(sq(0, 0, 0.004), sq(0.002, 0.002, 0.004), "and")
        assert region_area(inter) == pytest.approx(0.002 * 0.002, rel=1e-6)


class TestPolyPoly:
    def test_overlapping_rects(self):
        a = G("POLYGON((0 0,4 0,4 4,0 4,0 0))")
        b = G("POLYGON((2 2,6 2,6 6,2 6,2 2))")
        assert overlaps(a, b) and overlaps(b, a)
        assert intersects(a, b) and not touches(a, b)
        assert not within(a, b) and not contains(a, b)

    def test_edge_touching_rects(self):
        a = G("POLYGON((0 0,4 0,4 4,0 4,0 0))")
        b = G("POLYGON((4 0,8 0,8 4,4 4,4 0))")
        assert touches(a, b)
        assert intersects(a, b)
        assert not overlaps(a, b)

    def test_corner_touching_rects(self):
        a = G("POLYGON((0 0,4 0,4 4,0 4,0 0))")
        b = G("POLYGON((4 4,8 4,8 8,4 8,4 4))")
        assert touches(a, b)

    def test_equals_rotated_ring(self):
        a = G("POLYGON((0 0,4 0,4 4,0 4,0 0))")
        b = G("POLYGON((4 0,4 4,0 4,0 0,4 0))")
        assert equals(a, b)
        assert within(a, b) and contains(a, b)

    def test_within_with_hole(self):
        donut = G("POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))")
        inner = G("POLYGON((4.5 4.5,5.5 4.5,5.5 5.5,4.5 5.5,4.5 4.5))")
        assert not within(inner, donut)  # sits inside the hole
        edge = G("POLYGON((1 1,3 1,3 3,1 3,1 1))")
        assert within(edge, donut)


class TestPointCases:
    def test_point_in_poly(self):
        p = G("POINT(2 2)")
        sq = G("POLYGON((0 0,4 0,4 4,0 4,0 0))")
        assert within(p, sq) and contains(sq, p) and intersects(p, sq)
        assert not touches(p, sq)

    def test_point_on_boundary(self):
        p = G("POINT(4 2)")
        sq = G("POLYGON((0 0,4 0,4 4,0 4,0 0))")
        assert touches(p, sq)
        assert intersects(p, sq)
        assert not within(p, sq)

    def test_point_on_line(self):
        ln = G("LINESTRING(0 0,10 0)")
        assert within(G("POINT(5 0)"), ln)
        assert touches(G("POINT(0 0)"), ln)  # terminal endpoint
        assert not intersects(G("POINT(5 1)"), ln)

    def test_multipoint_crosses_poly(self):
        mp = G("MULTIPOINT((2 2),(20 20))")
        sq = G("POLYGON((0 0,4 0,4 4,0 4,0 0))")
        assert crosses(mp, sq)

    def test_point_equals(self):
        assert equals(G("POINT(1 2)"), G("POINT(1 2)"))
        assert not equals(G("POINT(1 2)"), G("POINT(1 3)"))


class TestLinePoly:
    SQ = "POLYGON((0 0,10 0,10 10,0 10,0 0))"

    def test_line_within(self):
        assert within(G("LINESTRING(1 1,9 9)"), G(self.SQ))

    def test_line_crosses(self):
        assert crosses(G("LINESTRING(-5 5,15 5)"), G(self.SQ))
        assert crosses(G(self.SQ), G("LINESTRING(-5 5,15 5)"))

    def test_line_touches_edge_ride(self):
        # line riding along the boundary only
        assert touches(G("LINESTRING(0 2,0 8)"), G(self.SQ))
        assert not crosses(G("LINESTRING(0 2,0 8)"), G(self.SQ))

    def test_line_outside(self):
        assert not intersects(G("LINESTRING(20 20,30 30)"), G(self.SQ))


class TestLineLine:
    def test_overlap_collinear(self):
        a = G("LINESTRING(0 0,10 0)")
        b = G("LINESTRING(5 0,15 0)")
        assert overlaps(a, b)
        assert not touches(a, b)
        assert not crosses(a, b)

    def test_t_joint_touches(self):
        a = G("LINESTRING(0 0,10 0)")
        b = G("LINESTRING(5 0,5 5)")  # b's endpoint on a's interior
        assert touches(a, b)
        assert not crosses(a, b)

    def test_within_subline(self):
        a = G("LINESTRING(2 0,8 0)")
        b = G("LINESTRING(0 0,10 0)")
        assert within(a, b)
        assert not within(b, a)
        assert equals(G("LINESTRING(0 0,10 0)"), G("LINESTRING(10 0,0 0)"))


class TestSparkSurface:
    def test_st_functions_sql(self, spark):
        from gdal_spark.operators.st_funcs import register_st_functions

        register_st_functions(spark)
        df = spark.createDataFrame(
            [
                Row(a="POLYGON((0 0,4 0,4 4,0 4,0 0))", b="POLYGON((2 2,6 2,6 6,2 6,2 2))"),
                Row(a="POLYGON((0 0,4 0,4 4,0 4,0 0))", b="POLYGON((4 0,8 0,8 4,4 4,4 0))"),
            ]
        )
        df.createOrReplaceTempView("pairs")
        rows = spark.sql(
            "SELECT ST_Overlaps(a, b) AS o, ST_Touches(a, b) AS t, "
            "ST_Area(a) AS area FROM pairs"
        ).collect()
        assert [(r.o, r.t) for r in rows] == [(True, False), (False, True)]
        assert all(r.area == pytest.approx(16.0) for r in rows)

    def test_ogr_geom_area_exact(self, spark):
        """OGR_GEOM_AREA must be the exact polygon area, not the
        envelope area (ogrfeaturequery.cpp:37; round-1 bug)."""
        from gdal_spark.ogr_sql import execute

        tri = spark.createDataFrame(
            [Row(_id=1, wkt="POLYGON((0 0,10 0,10 10,0 0))")]  # area 50, envelope 100
        )
        out = execute(spark, "SELECT OGR_GEOM_AREA AS a FROM t", {"t": tri})
        assert out.collect()[0]["a"] == pytest.approx(50.0)
