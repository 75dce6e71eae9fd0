"""Thin pipeline-verb wrappers: `gdal raster select` (band subset /
reorder / duplicate with renumbering), `gdal raster resize`
(translate-outsize composition), `gdal vector select` (field
projection with exclude / ignore-missing)."""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.raster import materialize_full
from gdal_spark.operators.translate import resize, select_bands, translate
from gdal_spark.relational import select_fields


def _two_band(spark):
    t1 = byte20_tiles(spark)
    t2 = t1.withColumn("band", F.lit(2)).withColumn(
        "payload", F.col("payload"))  # band2 = same bytes
    spec = dataclasses.replace(BYTE20_SPEC, nbands=2)
    return t1.unionByName(t2), spec


def test_select_bands_reorder_duplicate(spark):
    tiles, spec = _two_band(spark)
    out, ospec = select_bands(tiles, spec, [2, 1, 2])
    assert ospec.nbands == 3
    counts = {r.band: r.cnt for r in out.groupBy("band").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {1: 4, 2: 4, 3: 4}  # 2x2 tile grid per band
    a1 = materialize_full(out, ospec, band=1)
    a3 = materialize_full(out, ospec, band=3)
    np.testing.assert_array_equal(a1, BYTE20)
    np.testing.assert_array_equal(a3, BYTE20)
    with pytest.raises(ValueError, match="out of range"):
        select_bands(tiles, spec, [3])


def test_resize_matches_translate(spark):
    tiles = byte20_tiles(spark)
    r, rspec = resize(tiles, BYTE20_SPEC, 10, 10, resampling="average")
    t, tspec = translate(tiles, BYTE20_SPEC, outsize=(10, 10), resampling="average")
    assert (rspec.width, rspec.height) == (10, 10)
    assert rspec.gt == tspec.gt  # extent preserved, pixel size doubled
    np.testing.assert_array_equal(materialize_full(r, rspec), materialize_full(t, tspec))


def test_select_fields(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "x int, y string, z double")
    assert select_fields(df, ["z", "x"]).columns == ["z", "x"]
    assert select_fields(df, ["y"], exclude=True).columns == ["x", "z"]
    assert select_fields(df, ["y", "nope"], ignore_missing=True).columns == ["y"]
    with pytest.raises(ValueError, match="not found"):
        select_fields(df, ["nope"])


def test_export_schema(spark):
    from gdal_spark.operators.info import export_schema

    df = spark.createDataFrame(
        [(1, "a", 2.0, [1], 12345678901, "POINT (1 2)")],
        "i int, s string, d double, l array<int>, b bigint, wkt string")
    out = export_schema(df, "docs")
    lyr = out["layers"][0]
    assert lyr["name"] == "docs"
    assert [(f["name"], f["type"]) for f in lyr["fields"]] == [
        ("i", "Integer"), ("s", "String"), ("d", "Real"),
        ("l", "IntegerList"), ("b", "Integer64")]
    assert lyr["geometry_fields"] == [{"name": "wkt", "type": "Unknown"}]
    # no geometry column
    out2 = export_schema(df.drop("wkt"), "t", wkt_col=None)
    assert out2["layers"][0]["geometry_fields"] == []
