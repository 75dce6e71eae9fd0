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


# ---------------------------------------------------------------------------
# ogrtindex / gdal vector index (apps/gdalalg_vector_index.cpp)

from gdal_spark.operators.tindex import vector_index  # noqa: E402


def _feats(spark, rows):
    return spark.createDataFrame(
        rows,
        "location string, layer_idx int, env_minx double, env_miny double,"
        " env_maxx double, env_maxy double",
    )


def _layers(spark, rows):
    return spark.createDataFrame(
        rows, "location string, layer_idx int, crs string, schema array<string>"
    )


def test_vector_index_extent_ring_and_location(spark):
    # OGRPolygon(OGREnvelope) ring: (mnx mny, mnx MXY, mxx mxy, mxx MNY, close)
    f = _feats(
        spark,
        [
            ("a.gpkg", 0, 1.0, 2.0, 3.0, 4.0),
            ("a.gpkg", 0, -1.0, 0.0, 2.0, 9.0),
            ("a.gpkg", 1, 10.0, 10.0, 11.0, 11.0),
        ],
    )
    rows = {r.location: r for r in vector_index(f).collect()}
    assert set(rows) == {"a.gpkg,0", "a.gpkg,1"}
    r = rows["a.gpkg,0"]
    assert (r.minx, r.miny, r.maxx, r.maxy) == (-1.0, 0.0, 3.0, 9.0)
    assert r.wkt == "POLYGON ((-1.0 0.0,-1.0 9.0,3.0 9.0,3.0 0.0,-1.0 0.0))"


def test_vector_index_dataset_name_only(spark):
    f = _feats(spark, [("a.gpkg", 0, 0.0, 0.0, 1.0, 1.0), ("a.gpkg", 1, 5.0, 5.0, 6.0, 6.0)])
    locs = [r.location for r in vector_index(f, dataset_name_only=True).collect()]
    # dataset-name-only writes the bare name for EVERY layer (the
    # reference only dedups against the EXISTING index, :513-519)
    assert locs == ["a.gpkg", "a.gpkg"]


def test_vector_index_crs_skip_and_accept(spark):
    f = _feats(
        spark,
        [("a", 0, 0.0, 0.0, 1.0, 1.0), ("b", 0, 2.0, 2.0, 3.0, 3.0)],
    )
    m = _layers(
        spark,
        [("a", 0, "EPSG:4326", ["x:Integer:0:0"]), ("b", 0, "EPSG:32611", ["x:Integer:0:0"])],
    )
    # default: different CRS skipped (reference layer = first by (ds, idx))
    out = {r.location for r in vector_index(f, m).collect()}
    assert out == {"a,0"}
    out = {r.location for r in vector_index(f, m, accept_different_crs=True).collect()}
    assert out == {"a,0", "b,0"}


def test_vector_index_schema_skip_and_accept(spark):
    f = _feats(
        spark,
        [("a", 0, 0.0, 0.0, 1.0, 1.0), ("b", 0, 2.0, 2.0, 3.0, 3.0), ("c", 0, 4.0, 4.0, 5.0, 5.0)],
    )
    m = _layers(
        spark,
        [
            ("a", 0, "EPSG:4326", ["x:Integer:0:0", "n:String:10:0"]),
            ("b", 0, "EPSG:4326", ["x:Integer:0:0", "n:String:12:0"]),  # width differs
            ("c", 0, "EPSG:4326", ["x:Integer:0:0", "n:String:10:0"]),
        ],
    )
    out = {r.location for r in vector_index(f, m).collect()}
    assert out == {"a,0", "c,0"}
    out = {r.location for r in vector_index(f, m, accept_different_schemas=True).collect()}
    assert out == {"a,0", "b,0", "c,0"}


def test_vector_index_source_crs_field_and_resume(spark):
    f = _feats(
        spark,
        [("a", 0, 0.0, 0.0, 1.0, 1.0), ("b", 0, 2.0, 2.0, 3.0, 3.0)],
    )
    m = _layers(
        spark,
        [("a", 0, "EPSG:4326", []), ("b", 0, "EPSG:4326", [])],
    )
    out = vector_index(f, m, source_crs_name="src_srs").collect()
    assert all(r.src_srs == "EPSG:4326" for r in out)
    existing = spark.createDataFrame([("a,0",)], "location string")
    out = vector_index(f, m, existing=existing).collect()
    assert [r.location for r in out] == ["b,0"]


def test_vector_index_empty_layer_skipped(spark):
    # a layer present in meta but with no feature rows has no extent
    # (GetExtent failure path :692-698) — skipped
    f = _feats(spark, [("a", 0, 0.0, 0.0, 1.0, 1.0)])
    m = _layers(spark, [("a", 0, "EPSG:4326", []), ("a", 1, "EPSG:4326", [])])
    out = {r.location for r in vector_index(f, m).collect()}
    assert out == {"a,0"}


def test_vector_index_plan_is_python_free(spark):
    f = _feats(spark, [("a", 0, 0.0, 0.0, 1.0, 1.0)])
    plan = vector_index(f)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEval" not in plan and "BatchEvalPython" not in plan
