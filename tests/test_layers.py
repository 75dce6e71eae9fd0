"""Tests for layer-level operators: union/concat layers, mosaic/stack,
per-feature line-merge dissolve, partitioned writes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from gdal_spark.operators.dissolve import dissolve, dissolve_envelopes, merge_lines
from gdal_spark.operators.raster import mosaic, stack
from gdal_spark.relational import concat_layers, first_match_join, partition_write, union_layers


class TestLineMerge:
    def test_two_touching_segments_merge(self):
        out = merge_lines([np.array([[0.0, 0], [1, 0]]), np.array([[1.0, 0], [2, 0]])])
        assert len(out) == 1
        np.testing.assert_array_equal(out[0], [[0, 0], [1, 0], [2, 0]])

    def test_reversed_segment_merges(self):
        out = merge_lines([np.array([[0.0, 0], [1, 0]]), np.array([[2.0, 0], [1, 0]])])
        assert len(out) == 1 and len(out[0]) == 3

    def test_degree3_node_breaks_chain(self):
        segs = [
            np.array([[0.0, 0], [1, 0]]),
            np.array([[1.0, 0], [2, 0]]),
            np.array([[1.0, 0], [1, 1]]),  # third end at (1,0): degree 3
        ]
        out = merge_lines(segs)
        assert len(out) == 3  # nothing merges through a degree-3 node

    def test_disjoint_stay_separate(self):
        out = merge_lines([np.array([[0.0, 0], [1, 0]]), np.array([[5.0, 5], [6, 5]])])
        assert len(out) == 2

    def test_dissolve_df(self, spark):
        df = spark.createDataFrame(
            [
                (1, "MULTILINESTRING ((0 0,1 0),(1 0,2 0))"),
                (2, "POINT (3 3)"),
            ],
            "fid bigint, wkt string",
        )
        out = {r.fid: r.dissolved_wkt for r in dissolve(df).collect()}
        assert out[1] == "LINESTRING (0 0,1 0,2 0)"
        assert out[2] == "POINT (3 3)"  # non-lines pass through

    def test_dissolve_envelopes(self, spark):
        df = spark.createDataFrame(
            [
                Row(k="a", env_minx=0.0, env_miny=0.0, env_maxx=1.0, env_maxy=1.0),
                Row(k="a", env_minx=5.0, env_miny=-2.0, env_maxx=6.0, env_maxy=3.0),
                Row(k="b", env_minx=9.0, env_miny=9.0, env_maxx=9.0, env_maxy=9.0),
            ]
        )
        out = {r.k: r for r in dissolve_envelopes(df, ["k"]).collect()}
        assert (out["a"].env_minx, out["a"].env_miny, out["a"].env_maxx, out["a"].env_maxy) == (0, -2, 6, 3)
        assert out["a"].n_parts == 2 and out["b"].n_parts == 1


def _tiles(spark, arr, band=1):
    return spark.createDataFrame(
        [(band, 0, 0, arr.shape[0], arr.shape[1], str(arr.dtype), arr.tobytes())],
        "band int, ty int, tx int, h int, w int, dtype string, payload binary",
    )


class TestMosaicStack:
    def test_mosaic_last_wins_nonnodata(self, spark):
        a = np.array([[1, 2], [0, 4]], dtype=np.uint8)
        b = np.array([[9, 0], [7, 0]], dtype=np.uint8)
        out = mosaic([_tiles(spark, a), _tiles(spark, b)], nodata=0.0).collect()
        got = np.frombuffer(out[0].payload, dtype=out[0].dtype).reshape(2, 2)
        # b wins where b != 0; a shows through b's nodata holes
        np.testing.assert_array_equal(got, [[9, 2], [7, 4]])

    def test_mosaic_first(self, spark):
        a = np.array([[1, 0]], dtype=np.uint8)
        b = np.array([[9, 9]], dtype=np.uint8)
        out = mosaic([_tiles(spark, a), _tiles(spark, b)], nodata=0.0, method="first").collect()
        got = np.frombuffer(out[0].payload, dtype=out[0].dtype).reshape(1, 2)
        np.testing.assert_array_equal(got, [[1, 9]])

    def test_stack_renumbers_bands(self, spark):
        a = np.ones((2, 2), dtype=np.uint8)
        out = stack([_tiles(spark, a), _tiles(spark, a), _tiles(spark, a)])
        assert sorted(r.band for r in out.collect()) == [1, 2, 3]


class TestLayerUnions:
    def test_union_layers_missing_columns(self, spark):
        a = spark.createDataFrame([Row(x=1, y="a")])
        b = spark.createDataFrame([Row(x=2, z=3.0)])
        out = union_layers([a, b])
        assert set(out.columns) == {"x", "y", "z"}
        assert out.count() == 2

    def test_concat_layers_same_schema(self, spark):
        a = spark.createDataFrame([Row(x=1)])
        out = concat_layers([a, a, a])
        assert out.count() == 3

    def test_first_match_join(self, spark):
        left = spark.createDataFrame([Row(k=1), Row(k=2)])
        right = spark.createDataFrame([Row(fid=10, rk=1), Row(fid=5, rk=1)])
        out = first_match_join(left, right, "k", "rk", fid_col="fid").collect()
        got = {r.k: r.fid for r in out}
        assert got == {1: 5, 2: None}  # lowest fid wins


class TestPartitionWrite:
    def test_hive_layout_and_lineage(self, spark, tmp_path):
        import os

        df = spark.range(40).withColumn("part", (F.col("id") % 4).cast("int"))
        rec = partition_write(df, str(tmp_path / "o"), ["part"], job_id="pw")
        assert rec["row_count"] == 40
        listing = os.listdir(tmp_path / "o")
        assert "_lineage.json" in listing
        assert any(d.startswith("part=") for d in listing)
