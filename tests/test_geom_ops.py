"""Geometry constructor/transform tests (ogrgeometry.cpp Buffer /
Simplify / Centroid / ConvexHull / MakeValid / UnaryUnion / Distance /
Segmentize semantics) + the ST_* Spark surface + true group dissolve."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row

from gdal_spark.geom.overlay import region_area
from gdal_spark.geom.ops import (
    buffer,
    centroid,
    convex_hull,
    distance,
    make_valid,
    segmentize,
    simplify_dp,
    unary_union,
)
from gdal_spark.geom.relate import Geometry


def G(wkt):
    return Geometry.from_wkt(wkt)


def ring(*pts):
    a = np.array(pts, dtype=float)
    return np.vstack([a, a[:1]])


class TestUnaryUnion:
    def test_overlapping_squares(self):
        a = [ring((0, 0), (4, 0), (4, 4), (0, 4))]
        b = [ring((2, 2), (6, 2), (6, 6), (2, 6))]
        u = unary_union([a, b])
        assert len(u) == 1
        assert region_area(u) == pytest.approx(16 + 16 - 4)

    def test_disjoint_stays_multi(self):
        a = [ring((0, 0), (1, 0), (1, 1), (0, 1))]
        b = [ring((5, 5), (6, 5), (6, 6), (5, 6))]
        u = unary_union([a, b])
        assert len(u) == 2
        assert region_area(u) == pytest.approx(2.0)


class TestMakeValid:
    def test_bowtie(self):
        # self-intersecting bowtie -> two triangles, even-odd area 8
        bow = [np.array([[0, 0], [4, 4], [4, 0], [0, 4], [0, 0]], float)]
        v = make_valid(bow[0] if False else bow)
        assert len(v) == 2
        assert region_area(v) == pytest.approx(8.0)


class TestBuffer:
    def test_square_buffer_area(self):
        g = G("POLYGON((0 0,10 0,10 10,0 10,0 0))")
        d = 2.0
        out = buffer(g, d, quadrant_segments=8)
        # area = square + 4 edge strips + inscribed 32-gon corner area
        corner = 0.5 * 32 * d * d * math.sin(2 * math.pi / 32)
        expect = 100 + 4 * 10 * d + corner
        assert region_area(out) == pytest.approx(expect, rel=1e-3)  # snap-grid quantization

    def test_point_buffer_is_disc(self):
        out = buffer(G("POINT(5 5)"), 3.0)
        expect = 0.5 * 32 * 9 * math.sin(2 * math.pi / 32)
        assert len(out) == 1
        assert region_area(out) == pytest.approx(expect, rel=1e-3)  # snap-grid quantization

    def test_line_buffer(self):
        out = buffer(G("LINESTRING(0 0,10 0)"), 1.0)
        corner = 0.5 * 32 * math.sin(2 * math.pi / 32)
        assert region_area(out) == pytest.approx(10 * 2 + corner, rel=1e-3)

    def test_negative_buffer_erodes(self):
        out = buffer(G("POLYGON((0 0,10 0,10 10,0 10,0 0))"), -2.0)
        assert len(out) == 1
        assert region_area(out) == pytest.approx(36.0, rel=1e-3)
        # erosion past the inradius -> empty
        assert buffer(G("POLYGON((0 0,10 0,10 10,0 10,0 0))"), -5.5) == []
        # donut: outer shrinks, hole grows
        donut = G("POLYGON((0 0,12 0,12 12,0 12,0 0),(5 5,7 5,7 7,5 7,5 5))")
        er = buffer(donut, -1.0)
        # area = 10*10 - 4*4 (hole grows from 2x2 to 4x4)
        assert region_area(er) == pytest.approx(100 - 16, rel=2e-2)

    def test_negative_buffer_point_line_empty(self):
        assert buffer(G("POINT(0 0)"), -1.0) == []
        assert buffer(G("LINESTRING(0 0,5 0)"), -1.0) == []


class TestHullSimplifyCentroid:
    def test_convex_hull(self):
        pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 1]], float)
        h = convex_hull(pts)
        assert len(h) == 5  # closed square
        assert {tuple(p) for p in h[:-1]} == {(0, 0), (4, 0), (4, 4), (0, 4)}

    def test_simplify_collinear(self):
        ln = np.array([[0, 0], [1, 0.001], [2, 0], [3, 0.001], [4, 0]], float)
        out = simplify_dp(ln, 0.01)
        assert len(out) == 2
        out2 = simplify_dp(ln, 0.0001)
        assert len(out2) == 5

    def test_centroid_polygon(self):
        assert centroid(G("POLYGON((0 0,4 0,4 4,0 4,0 0))")) == pytest.approx((2, 2))
        # with a hole offset from center, centroid shifts away from it
        cx, cy = centroid(G("POLYGON((0 0,4 0,4 4,0 4,0 0),(2 2,4 2,4 4,2 4,2 2))"))
        assert cx < 2 and cy < 2

    def test_centroid_concave_triangle(self):
        cx, cy = centroid(G("POLYGON((0 0,6 0,0 6,0 0))"))
        assert (cx, cy) == pytest.approx((2.0, 2.0))

    def test_centroid_line_point(self):
        assert centroid(G("LINESTRING(0 0,10 0)")) == pytest.approx((5, 0))
        assert centroid(G("MULTIPOINT((1 1),(3 3))")) == pytest.approx((2, 2))


class TestDistanceSegmentize:
    def test_distance_rects(self):
        a = G("POLYGON((0 0,1 0,1 1,0 1,0 0))")
        b = G("POLYGON((4 0,5 0,5 1,4 1,4 0))")
        assert distance(a, b) == pytest.approx(3.0)

    def test_distance_diagonal(self):
        a = G("POINT(0 0)")
        b = G("POLYGON((3 4,5 4,5 6,3 6,3 4))")
        assert distance(a, b) == pytest.approx(5.0)

    def test_distance_intersecting_zero(self):
        a = G("POLYGON((0 0,4 0,4 4,0 4,0 0))")
        b = G("POINT(2 2)")
        assert distance(a, b) == 0.0

    def test_distance_line_line(self):
        assert distance(G("LINESTRING(0 0,0 10)"), G("LINESTRING(3 5,9 5)")) == pytest.approx(3.0)

    def test_segmentize(self):
        out = segmentize(np.array([[0, 0], [10, 0]], float), 3.0)
        # 10/3 -> 4 equal parts of 2.5
        assert len(out) == 5
        np.testing.assert_allclose(np.diff(out[:, 0]), 2.5)
        # already short: unchanged
        out2 = segmentize(np.array([[0, 0], [1, 0]], float), 3.0)
        assert len(out2) == 2


class TestSparkSurface:
    def test_st_constructors_sql(self, spark):
        from gdal_spark.operators.st_funcs import register_st_functions

        register_st_functions(spark)
        df = spark.createDataFrame([Row(w="POLYGON((0 0,10 0,10 10,0 10,0 0))")])
        df.createOrReplaceTempView("g")
        r = spark.sql(
            "SELECT ST_Centroid(w) AS c, ST_Area(ST_Buffer(w, 2.0)) AS ba, "
            "ST_Area(ST_ConvexHull(w)) AS ha, "
            "ST_Distance(w, 'POINT(15 5)') AS d FROM g"
        ).collect()[0]
        assert r.c == "POINT (5 5)"
        corner = 0.5 * 32 * 4 * math.sin(2 * math.pi / 32)
        assert r.ba == pytest.approx(100 + 80 + corner, rel=1e-3)
        assert r.ha == pytest.approx(100.0)
        assert r.d == pytest.approx(5.0)

    def test_st_makevalid_sql(self, spark):
        from gdal_spark.operators.st_funcs import register_st_functions

        register_st_functions(spark)
        df = spark.createDataFrame([Row(w="POLYGON((0 0,4 4,4 0,0 4,0 0))")])
        df.createOrReplaceTempView("bow")
        r = spark.sql("SELECT ST_Area(ST_MakeValid(w)) AS a FROM bow").collect()[0]
        assert r.a == pytest.approx(8.0)

    def test_dissolve_union_group(self, spark):
        from gdal_spark.geom.wkt import parse_wkt
        from gdal_spark.operators.dissolve import dissolve_union

        df = spark.createDataFrame(
            [
                Row(k=1, wkt="POLYGON((0 0,4 0,4 4,0 4,0 0))"),
                Row(k=1, wkt="POLYGON((2 2,6 2,6 6,2 6,2 2))"),
                Row(k=2, wkt="POLYGON((0 0,1 0,1 1,0 1,0 0))"),
                Row(k=2, wkt="POLYGON((5 5,6 5,6 6,5 6,5 5))"),
            ]
        )
        out = {r.k: r.union_wkt for r in dissolve_union(df, ["k"]).collect()}
        assert parse_wkt([out[1]]).areas()[0] == pytest.approx(28.0)
        assert parse_wkt([out[2]]).areas()[0] == pytest.approx(2.0)
        assert out[2].startswith("MULTIPOLYGON")
