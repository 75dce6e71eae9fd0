"""GeoParquet sink: footer metadata, float32-outward bbox covering,
round trip, and scan-side pushdown interop."""

from __future__ import annotations

import json
import tempfile

import numpy as np
import pyarrow.parquet as pq
import pytest

from gdal_spark.operators.geoparquet import (
    cast_to_float_down,
    cast_to_float_up,
    write_geoparquet,
)


class TestFloatRounding:
    def test_outward(self):
        # 0.1 is not float32-representable; f32(0.1) > 0.1 so xmin
        # must round DOWN below the double
        d = np.array([0.1])
        down = cast_to_float_down(d)
        up = cast_to_float_up(d)
        assert float(down[0]) <= 0.1 <= float(up[0])
        assert down[0] != up[0]
        # negative values mirror
        d = np.array([-0.1])
        assert float(cast_to_float_down(d)[0]) <= -0.1 <= float(cast_to_float_up(d)[0])
        # exactly representable values stay
        assert float(cast_to_float_down(np.array([0.5]))[0]) == 0.5
        assert float(cast_to_float_up(np.array([0.5]))[0]) == 0.5


class TestWriteGeoParquet:
    def test_footer_and_roundtrip(self, spark):
        rows = [
            (1, "POINT (0.1 2.7)"),
            (2, "POLYGON ((0 0, 0 4, 3 4, 3 0, 0 0))"),
            (3, "LINESTRING (5 5, 9 9)"),
            (4, "POINT (-0.1 -7.3)"),
        ]
        df = spark.createDataFrame(rows, "fid int, wkt string")
        with tempfile.TemporaryDirectory() as td:
            manifest = write_geoparquet(df, td, num_files=2).collect()
            assert sum(r.rows for r in manifest) == 4
            files = sorted(r.file for r in manifest if r.rows)
            meta = pq.read_table(files[0]).schema.metadata
            geo = json.loads(meta[b"geo"].decode())
            assert geo["version"] == "1.1.0"
            assert geo["primary_column"] == "geometry"
            col = geo["columns"]["geometry"]
            assert col["encoding"] == "WKB"
            assert col["crs"] is None
            assert col["covering"]["bbox"]["xmin"] == ["geometry_bbox", "xmin"]
            assert set(col["geometry_types"]) <= {
                "Point", "LineString", "Polygon", "MultiPoint",
                "MultiLineString", "MultiPolygon", "GeometryCollection",
            }
            # bbox struct is float32 and covers the doubles outward
            t = pq.read_table(files[0])
            bbox = t.column("geometry_bbox")
            assert str(bbox.type.field("xmin").type) == "float"
            # spark reads it back; pushdown on the covering column
            back = spark.read.parquet(td)
            assert back.count() == 4
            assert set(back.columns) == {"fid", "geometry", "geometry_bbox"}
            plan = back.filter("geometry_bbox.xmin >= 1.0")._jdf.queryExecution().executedPlan().toString()
            assert "PushedFilters" in plan and "xmin" in plan
            # WKB round-trips through the repo's own decoder
            from gdal_spark.geom.wkb import wkb_to_geom
            from gdal_spark.geom.wkt import to_wkt

            got = {r.fid: bytes(r.geometry) for r in back.collect()}
            wkts = to_wkt(wkb_to_geom([got[k] for k in sorted(got)]))
            assert wkts[0] == "POINT (0.1 2.7)"
            assert wkts[1].startswith("POLYGON")

    def test_bbox_covers_all_geometries(self, spark):
        rng = np.random.default_rng(3)
        rows = [
            (int(i), f"POINT ({rng.uniform(-100, 100)} {rng.uniform(-50, 50)})")
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "fid int, wkt string")
        with tempfile.TemporaryDirectory() as td:
            man = write_geoparquet(df, td, num_files=3).collect()
            back = spark.read.parquet(td).collect()
            from gdal_spark.geom.wkb import wkb_to_geom

            for r in back:
                env = wkb_to_geom([bytes(r.geometry)]).envelopes()[0]
                assert r.geometry_bbox.xmin <= env[0] and env[2] <= r.geometry_bbox.xmax
                assert r.geometry_bbox.ymin <= env[1] and env[3] <= r.geometry_bbox.ymax
