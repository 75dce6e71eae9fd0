"""GNM network-construction tests (operators/gnm.py) — semantics
pinned against gnm/gnmgenericnetwork.cpp ConnectPointsByLines/
FindNearestPoint/ConnectPointsByMultiline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.gnm import (
    DIR_SRC_TO_TGT,
    connect_points_by_lines,
    line_endpoints,
    network_edges,
    point_coords,
)


@pytest.fixture(scope="module")
def layers(spark):
    points = spark.createDataFrame(
        [
            (1, "POINT (0 0)"),
            (2, "POINT (10 0)"),
            (3, "POINT (10 10)"),
            (9, "POINT (10.1 0.1)"),  # also inside L1's end rect; higher fid
            (7, None),  # null geometry: never a snap target
        ],
        "fid long, wkt string",
    )
    lines = spark.createDataFrame(
        [
            # both endpoints snap (tol 1 -> rect +-0.5)
            (100, "LINESTRING (0.1 -0.2, 9.8 0.3)"),
            # multiline: member 0 connects 2->3, member 1 connects 3->1
            (101, "MULTILINESTRING ((10.2 0.4, 10 9.9), (9.6 10.2, 0.4 0.0))"),
            # far endpoint: no snap -> dropped
            (102, "LINESTRING (0 0, 50 50)"),
            # non-line geometry: skipped by the layer walk
            (103, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
        ],
        "fid long, wkt string",
    )
    return points, lines


def test_endpoint_extraction(spark, layers):
    _, lines = layers
    rows = {(r.connector, r.member): (r.sx, r.sy, r.ex, r.ey)
            for r in line_endpoints(lines).collect()}
    assert rows[(100, 0)] == (0.1, -0.2, 9.8, 0.3)
    assert rows[(101, 1)] == (9.6, 10.2, 0.4, 0.0)
    assert (102, 0) in rows and (103, 0) not in rows


def test_point_coords_skips_null(spark, layers):
    points, _ = layers
    got = {r.pfid: (r.px, r.py) for r in point_coords(points).collect()}
    assert got[2] == (10.0, 0.0) and 7 not in got


def test_connect_semantics(spark, layers):
    points, lines = layers
    conns = connect_points_by_lines(points, lines, tolerance=1.0).collect()
    got = {(r.src, r.tgt, r.connector) for r in conns}
    # L1 end (9.8, 0.3): rect +-0.5 holds fid 2 (dx .2, dy .3) AND
    # fid 9 (dx .3, dy .2) -> FindNearestPoint takes the scan-first
    # (lowest) fid = 2
    assert (1, 2, 100) in got
    # multiline members under one connector
    assert (2, 3, 101) in got and (3, 1, 101) in got
    # unsnapped + non-line dropped
    assert all(c in (100, 101) for _, _, c in got)
    assert len(got) == 3


def test_direction_edges(spark, layers):
    points, lines = layers
    conns = connect_points_by_lines(
        points, lines, tolerance=1.0, cost=5.0, inv_cost=8.0
    )
    both = network_edges(conns)
    w = {(r.src, r.dst): r.weight for r in both.collect()}
    assert w[(1, 2)] == 5.0 and w[(2, 1)] == 8.0
    assert len(w) == 6  # 3 connections x 2 directions
    one_way = network_edges(
        conns.withColumn("direction", F.lit(DIR_SRC_TO_TGT))
    )
    assert one_way.count() == 3
    assert {(r.src, r.dst) for r in one_way.collect()} == {(1, 2), (2, 3), (3, 1)}


def test_feeds_graph_operators(spark, layers):
    from gdal_spark.operators.graph import connected_components, shortest_paths

    points, lines = layers
    conns = connect_points_by_lines(points, lines, tolerance=1.0, cost=2.0, inv_cost=2.0)
    edges = network_edges(conns)
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    # 1-2-3 form one component (point 9 never snapped as a vertex)
    assert comp[1] == comp[2] == comp[3] == 1
    dist = {r.node: r.dist for r in shortest_paths(edges, 1).collect()}
    # triangle: the 3->1 connection's reverse edge makes 1->3 direct
    assert dist[3] == 2.0 and dist[2] == 2.0


def test_tolerance_is_rect_not_distance(spark):
    # dx = dy = 0.45 -> euclidean 0.636 > 0.5, but the reference's
    # filter is a RECTANGLE (SetSpatialFilterRect), so it snaps
    points = spark.createDataFrame(
        [(1, "POINT (0 0)"), (2, "POINT (5.45 5.45)")], "fid long, wkt string"
    )
    lines = spark.createDataFrame(
        [(10, "LINESTRING (0 0, 5 5)")], "fid long, wkt string"
    )
    got = connect_points_by_lines(points, lines, tolerance=1.0).collect()
    assert len(got) == 1 and (got[0].src, got[0].tgt) == (1, 2)
