"""gdaltindex (apps/gdaltindex_lib.cpp) — footprint ring order, rotated
geotransforms, pixel-size skips, re-run skip, and the pure-Catalyst
plan shape."""

from __future__ import annotations

import math

from gdal_spark.operators.tindex import tile_index


def _meta(spark, rows):
    return spark.createDataFrame(
        rows, "location string, width int, height int, gt array<double>"
    )


def test_ring_order_matches_reference(spark):
    # gdaltindex_lib.cpp corner order: (0,0) (W,0) (W,H) (0,H) (0,0)
    m = _meta(spark, [("a.tif", 20, 10, [100.0, 2.0, 0.0, 500.0, 0.0, -3.0])])
    r = tile_index(m).first()
    assert r["wkt"] == "POLYGON ((100.0 500.0,140.0 500.0,140.0 470.0,100.0 470.0,100.0 500.0))"
    assert (r["minx"], r["miny"], r["maxx"], r["maxy"]) == (100.0, 470.0, 140.0, 500.0)
    # res = sqrt(40*30 / 20 / 10) = sqrt(6)
    assert r["res"] == math.sqrt(6.0)


def test_rotated_geotransform_footprint(spark):
    # 90-degree rotation terms: xscale/yscale 0, xrot/yrot nonzero
    m = _meta(spark, [("r.tif", 4, 6, [0.0, 0.0, 1.0, 0.0, 1.0, 0.0])])
    r = tile_index(m).first()
    # corners: (0,0), (0,4), (6,4), (6,0)
    assert r["wkt"] == "POLYGON ((0.0 0.0,0.0 4.0,6.0 4.0,6.0 0.0,0.0 0.0))"
    assert (r["minx"], r["miny"], r["maxx"], r["maxy"]) == (0.0, 0.0, 6.0, 4.0)


def test_pixel_size_skips(spark):
    m = _meta(spark, [
        ("fine.tif", 10, 10, [0.0, 1.0, 0.0, 10.0, 0.0, -1.0]),    # res 1
        ("coarse.tif", 10, 10, [0.0, 30.0, 0.0, 300.0, 0.0, -30.0]),  # res 30
    ])
    assert {r["location"] for r in tile_index(m, min_pixel_size=2.0).collect()} == {"coarse.tif"}
    assert {r["location"] for r in tile_index(m, max_pixel_size=2.0).collect()} == {"fine.tif"}
    # boundary is inclusive both ways (reference skips on strict < / >)
    assert {r["location"] for r in tile_index(m, min_pixel_size=1.0, max_pixel_size=30.0).collect()} \
        == {"fine.tif", "coarse.tif"}


def test_existing_index_skip(spark):
    m = _meta(spark, [
        ("a.tif", 2, 2, [0.0, 1.0, 0.0, 2.0, 0.0, -1.0]),
        ("b.tif", 2, 2, [0.0, 1.0, 0.0, 2.0, 0.0, -1.0]),
    ])
    existing = spark.createDataFrame([("a.tif",)], "location string")
    got = tile_index(m, existing=existing).collect()
    assert [r["location"] for r in got] == ["b.tif"]


def test_plan_is_python_free(spark):
    m = _meta(spark, [("a.tif", 2, 2, [0.0, 1.0, 0.0, 2.0, 0.0, -1.0])])
    plan = tile_index(m, min_pixel_size=0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
