"""vector_translate (ogr2ogr stage chain, ogr2ogr_lib.cpp:6507):
stage order and per-stage semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from gdal_spark.geom.wkt import parse_wkt
from gdal_spark.operators.vector_translate import vector_translate


def _scale2():
    """Stub CRS pipeline: doubles coordinates (stands in for t_srs).
    Defined inside a factory so cloudpickle ships it BY VALUE to the
    executors (test modules are not importable there)."""

    class _Scale2:
        def forward(self, x, y):
            return np.asarray(x) * 2.0, np.asarray(y) * 2.0

    return _Scale2()


@pytest.fixture()
def layer(spark):
    return spark.createDataFrame(
        [
            Row(fid=1, name="a", wkt="POLYGON ((0 0,4 0,4 4,0 4,0 0))"),
            Row(fid=2, name="b", wkt="POLYGON ((10 10,14 10,14 14,10 14,10 10))"),
            Row(fid=3, name="c", wkt="MULTIPOINT ((1 1),(3 3))"),
        ]
    )


class TestStages:
    def test_where_select_limit(self, spark, layer):
        out = vector_translate(layer, where="name = 'a'", select=["fid"])
        rows = out.collect()
        assert len(rows) == 1 and rows[0].fid == 1
        assert out.columns == ["fid", "wkt"]

    def test_spat_filter(self, spark, layer):
        out = vector_translate(layer, spat=(0, 0, 5, 5))
        assert sorted(r.fid for r in out.collect()) == [1, 3]

    def test_explode_collections(self, spark, layer):
        out = vector_translate(layer.filter("fid = 3"), explode_collections=True)
        rows = out.collect()
        assert len(rows) == 2
        assert all(r.wkt.startswith("POINT") for r in rows)

    def test_segmentize_then_simplify(self, spark, layer):
        # segmentize adds vertices; simplify with a big tolerance
        # removes the collinear ones again
        out = vector_translate(layer.filter("fid = 1"), segmentize_max=1.0)
        b = parse_wkt([out.collect()[0].wkt])
        assert len(b.coords) == 17  # 4 edges x 4 pieces + closure
        out2 = vector_translate(
            layer.filter("fid = 1"), segmentize_max=1.0, simplify_tol=0.01
        )
        b2 = parse_wkt([out2.collect()[0].wkt])
        assert len(b2.coords) == 5

    def test_clip_src_before_reproject(self, spark, layer):
        """-clipsrc applies in SOURCE coords, then t_srs scales: the
        clipped square [0,2]^2 doubles to [0,4]^2 (reversing the order
        would clip the scaled geometry instead — envelope would be
        [0,2]^2)."""
        out = vector_translate(
            layer.filter("fid = 1"),
            clip_src="POLYGON ((0 0,2 0,2 2,0 2,0 0))",
            pipeline=_scale2(),
        )
        env = parse_wkt([out.collect()[0].wkt]).envelopes()[0]
        assert tuple(env) == (0.0, 0.0, 4.0, 4.0)

    def test_clip_dst_after_reproject(self, spark, layer):
        out = vector_translate(
            layer.filter("fid = 1"),
            pipeline=_scale2(),
            clip_dst="POLYGON ((0 0,3 0,3 3,0 3,0 0))",
        )
        env = parse_wkt([out.collect()[0].wkt]).envelopes()[0]
        assert tuple(env) == (0.0, 0.0, 3.0, 3.0)

    def test_clipped_away_dropped(self, spark, layer):
        out = vector_translate(layer, clip_src="POLYGON ((100 100,101 100,101 101,100 101,100 100))")
        assert out.count() == 0

    def test_make_valid_bowtie(self, spark):
        df = spark.createDataFrame([Row(fid=1, wkt="POLYGON ((0 0,4 4,4 0,0 4,0 0))")])
        out = vector_translate(df, make_valid=True)
        b = parse_wkt([out.collect()[0].wkt])
        assert b.areas()[0] == pytest.approx(8.0)

    def test_attrs_ride_along(self, spark, layer):
        out = vector_translate(layer, clip_src="POLYGON ((0 0,5 0,5 5,0 5,0 0))")
        rows = {r.fid: r.name for r in out.collect()}
        assert rows == {1: "a", 3: "c"}


class TestGCTranslate:
    def test_gc_explode_and_passthrough(self, spark):
        from gdal_spark.operators.vector_translate import vector_translate

        gc = "GEOMETRYCOLLECTION (POINT (1 2),LINESTRING (0 0,4 4),POLYGON ((0 0,0 2,2 2,2 0,0 0)))"
        df = spark.createDataFrame([(1, gc)], "fid bigint, wkt string")
        # explode: one row per atomic member
        out = vector_translate(df, explode_collections=True).collect()
        assert sorted(r.wkt.split(" ")[0] for r in out) == ["LINESTRING", "POINT", "POLYGON"]
        # passthrough: one row, reassembled collection
        out2 = vector_translate(df).collect()
        assert len(out2) == 1 and out2[0].wkt.startswith("GEOMETRYCOLLECTION (POINT (1 2)")

    def test_gc_clip_drops_members(self, spark):
        from gdal_spark.operators.vector_translate import vector_translate

        gc = "GEOMETRYCOLLECTION (POINT (1 2),POINT (50 50))"
        df = spark.createDataFrame([(1, gc)], "fid bigint, wkt string")
        out = vector_translate(df, clip_src="POLYGON ((0 0,0 5,5 5,5 0,0 0))").collect()
        assert len(out) == 1 and out[0].wkt == "POINT (1 2)"
