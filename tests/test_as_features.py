"""`gdal raster as-features` full layer semantics
(apps/gdalalg_raster_as_features.cpp): per-pixel features with BAND_n
fields, CENTER_X/Y, ROW/COL, point/polygon geometry, first-band
skip-nodata rule, sparse-table densification."""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.raster import RasterSpec, as_features_layer


def test_polygon_ring_and_fields(spark):
    t = byte20_tiles(spark)
    df = as_features_layer(t, BYTE20_SPEC, geometry_type="polygon",
                           include_xy=True, include_row_col=True)
    rows = {(r.ROW, r.COL): r for r in df.collect()}
    assert len(rows) == 400
    r = rows[(2, 3)]
    # ring (p,l)->(p,l+1)->(p+1,l+1)->(p+1,l)->close (reference :258-276)
    x0, y0 = 440720 + 3 * 60, 3751320 - 2 * 60
    x1, y1 = x0 + 60, y0 - 60
    assert r.geom == (f"POLYGON(({x0} {y0},{x0} {y1},{x1} {y1},{x1} {y0},{x0} {y0}))")
    assert r.CENTER_X == 440720 + 3.5 * 60
    assert r.CENTER_Y == 3751320 - 2.5 * 60
    assert r.BAND_1 == float(BYTE20[2, 3])


def test_point_geometry_and_defaults(spark):
    t = byte20_tiles(spark)
    df = as_features_layer(t, BYTE20_SPEC, geometry_type="point", include_row_col=True)
    r = {(q.ROW, q.COL): q for q in df.collect()}[(0, 0)]
    assert r.geom == "POINT(440750 3751290)"
    # default: geometry none, no xy, no row/col -> BAND_1 only
    df2 = as_features_layer(t, BYTE20_SPEC)
    assert df2.columns == ["BAND_1"]
    assert df2.count() == 400


def test_skip_nodata_first_band_only(spark):
    t = byte20_tiles(spark)
    n107 = int((BYTE20 == 107).sum())
    df = as_features_layer(t, BYTE20_SPEC, skip_nodata=True, nodata=107.0,
                           include_row_col=True)
    assert df.count() == 400 - n107
    # two bands: band2 = reversed values; nodata test reads ONLY the
    # first selected band (reference tests *pSrcVal, :305)
    spec2 = dataclasses.replace(BYTE20_SPEC, nbands=2)
    t2 = t.unionByName(t.withColumn("band", F.lit(2)))
    df2 = as_features_layer(t2, spec2, bands=[2, 1], skip_nodata=True,
                            nodata=107.0, include_row_col=True)
    # bands=[2,1]: first selected band is band 2 (same values here) —
    # still drops the 107 pixels, and both band fields ride each row
    rows = {(r.ROW, r.COL): r for r in df2.collect()}
    assert len(rows) == 400 - n107
    r = rows[(0, 1)]
    assert r.BAND_2 == r.BAND_1 == float(BYTE20[0, 1])


def test_nan_nodata(spark):
    spec = RasterSpec(width=4, height=2, gt=(0.0, 1.0, 0.0, 2.0, 0.0, -1.0),
                      dtype="float64", tile_size=4)
    arr = np.array([[1.0, np.nan, 3.0, np.nan], [5.0, 6.0, np.nan, 8.0]])
    t = spark.createDataFrame(
        [(1, 0, 0, 2, 4, "float64", arr.tobytes())],
        "band int, ty int, tx int, h int, w int, dtype string, payload binary")
    df = as_features_layer(t, spec, skip_nodata=True, nodata=float("nan"),
                           include_row_col=True)
    kept = {(r.ROW, r.COL) for r in df.collect()}
    assert kept == {(0, 0), (0, 2), (1, 0), (1, 1), (1, 3)}


def test_sparse_table_densifies(spark):
    # drop tile (0,0): its 16x16 pixels come back init-valued
    t = byte20_tiles(spark).filter(~((F.col("ty") == 0) & (F.col("tx") == 0)))
    df = as_features_layer(t, BYTE20_SPEC, include_row_col=True)
    rows = {(r.ROW, r.COL): r.BAND_1 for r in df.collect()}
    assert len(rows) == 400
    assert rows[(3, 3)] == float(BYTE20_SPEC.init)
    assert rows[(3, 17)] == float(BYTE20[3, 17])


def test_rotated_gt_polygon(spark):
    spec = RasterSpec(width=2, height=1, gt=(10.0, 2.0, 0.5, 20.0, 0.25, -3.0),
                      dtype="uint8", tile_size=4)
    arr = np.array([[7, 9]], dtype=np.uint8)
    t = spark.createDataFrame(
        [(1, 0, 0, 1, 2, "uint8", arr.tobytes())],
        "band int, ty int, tx int, h int, w int, dtype string, payload binary")
    df = as_features_layer(t, spec, geometry_type="polygon", include_row_col=True)
    r = {(q.ROW, q.COL): q for q in df.collect()}[(0, 1)]

    def c(p, ln):
        return (10.0 + p * 2.0 + ln * 0.5, 20.0 + p * 0.25 + ln * -3.0)

    ring = [c(1, 0), c(1, 1), c(2, 1), c(2, 0), c(1, 0)]
    from gdal_spark.geom.wkt import _fmt_d
    exp = "POLYGON((" + ",".join(f"{_fmt_d(x)} {_fmt_d(y)}" for x, y in ring) + "))"
    assert r.geom == exp


def test_bad_geometry_type(spark):
    t = byte20_tiles(spark)
    with pytest.raises(ValueError, match="geometry-type"):
        as_features_layer(t, BYTE20_SPEC, geometry_type="line")
