"""raster_info / vector_info (gcore/rasterband.cpp ComputeStatistics,
apps/ogrinfo_lib.cpp ReportOnLayer)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.info import raster_info, vector_info


class TestRasterInfo:
    def test_full_raster_matches_numpy(self, spark):
        r = raster_info(byte20_tiles(spark), BYTE20_SPEC).collect()[0]
        a = BYTE20.astype(np.float64)
        assert (r["width"], r["height"], r["n_px"]) == (20, 20, 400)
        assert r["min"] == a.min() and r["max"] == a.max()
        assert r["mean"] == pytest.approx(a.mean(), abs=1e-12)
        assert r["stddev"] == pytest.approx(a.std(), rel=1e-12)

    def test_sparse_tiles_fold_init(self, spark):
        """Absent tiles contribute spec.init pixels — GDAL stats run
        over the FULL raster, not just materialized blocks."""
        tiles = byte20_tiles(spark).filter(~((F.col("ty") == 0) & (F.col("tx") == 0)))
        r = raster_info(tiles, BYTE20_SPEC).collect()[0]
        ts = BYTE20_SPEC.tile_size
        a = BYTE20.astype(np.float64).copy()
        a[:ts, :ts] = BYTE20_SPEC.init or 0.0
        assert r["n_px"] == 400
        assert r["min"] == a.min() and r["max"] == a.max()
        assert r["mean"] == pytest.approx(a.mean(), abs=1e-12)
        assert r["stddev"] == pytest.approx(a.std(), rel=1e-12)


WKTS = [
    (1, "POINT (30 -10)"),
    (2, "POINT (5 42)"),
    (3, "LINESTRING (0 0, 10 20)"),
    (4, "POLYGON ((1 1, 9 1, 9 9, 1 9, 1 1))"),
    (5, "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)))"),
    (6, "GEOMETRYCOLLECTION (POINT (50 60))"),
]


class TestVectorInfo:
    def test_counts_and_extent_parse_path(self, spark):
        df = spark.createDataFrame(WKTS, "fid long, wkt string")
        r = vector_info(df).collect()[0]
        assert r["n_features"] == 6
        assert r["n_points"] == 2
        assert r["n_lines"] == 1
        assert r["n_polygons"] == 2
        assert r["n_collections"] == 1
        assert r["n_other"] == 0
        assert (r["minx"], r["miny"]) == (0.0, -10.0)
        assert (r["maxx"], r["maxy"]) == (50.0, 60.0)

    def test_env_cols_path(self, spark):
        df = spark.createDataFrame(
            [("POINT (3 4)", 3.0, 4.0, 3.0, 4.0), ("POINT (-1 9)", -1.0, 9.0, -1.0, 9.0)],
            "wkt string, ex0 double, ey0 double, ex1 double, ey1 double",
        )
        r = vector_info(df, env_cols=("ex0", "ey0", "ex1", "ey1")).collect()[0]
        assert r["n_points"] == 2
        assert (r["minx"], r["miny"], r["maxx"], r["maxy"]) == (-1.0, 4.0, 3.0, 9.0)

    def test_scientific_notation_coords(self, spark):
        df = spark.createDataFrame(
            [("POINT (1e2 -2.5e1)",)], "wkt string"
        )
        r = vector_info(df).collect()[0]
        assert (r["minx"], r["miny"]) == (100.0, -25.0)


class TestReviewRegressions:
    def test_all_init_band_still_reported(self, spark):
        """A band with zero materialized tiles must report
        min=max=mean=init, stddev=0 — bands seed from spec.nbands."""
        from gdal_spark.operators.raster import RasterSpec

        spec = RasterSpec(width=8, height=8, gt=(0, 1, 0, 8, 0, -1),
                          dtype="uint8", nbands=2, tile_size=8, init=7.0)
        tiles = spark.createDataFrame(
            [(1, 0, 0, 8, 8, "uint8", bytes(bytearray(range(64))))],
            "band int, ty int, tx int, h int, w int, dtype string, payload binary",
        )
        rows = {r["band"]: r for r in raster_info(tiles, spec).collect()}
        assert set(rows) == {1, 2}
        assert rows[2]["min"] == 7.0 and rows[2]["max"] == 7.0
        assert rows[2]["mean"] == 7.0 and rows[2]["stddev"] == 0.0

    def test_point_z_extent(self, spark):
        df = spark.createDataFrame(
            [("POINT Z (1 2 500)",), ("LINESTRING ZM (0 0 9 9, 10 20 9 9)",)],
            "wkt string",
        )
        r = vector_info(df).collect()[0]
        assert (r["minx"], r["miny"], r["maxx"], r["maxy"]) == (0.0, 0.0, 10.0, 20.0)
