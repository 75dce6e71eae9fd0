"""GeoJSON / GeoJSONSeq IO (operators/geojson.py) — conversion
round-trips plus file-level read/write through Spark."""

from __future__ import annotations

import json

import pytest

from gdal_spark.operators.geojson import (
    geojson_lines,
    json_geometry_to_wkt,
    read_geojson,
    wkt_to_json_geometry,
    write_geojson,
)

WKTS = [
    "POINT (1 2)",
    "POINT (1.5 -2.25)",
    "LINESTRING (0 0, 1.5 2.25, 3 4)",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 2))",
    "MULTIPOINT ((1 2), (3 4))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 0)), ((10 10, 12 10, 12 12, 10 10)))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1), POLYGON ((0 0, 2 0, 2 2, 0 0)))",
    "POINT EMPTY",
    "MULTIPOLYGON EMPTY",
    "GEOMETRYCOLLECTION EMPTY",
]


class TestConversion:
    @pytest.mark.parametrize("wkt", WKTS)
    def test_wkt_json_wkt(self, wkt):
        assert json_geometry_to_wkt(wkt_to_json_geometry(wkt)) == wkt

    def test_null(self):
        assert wkt_to_json_geometry(None) is None
        assert json_geometry_to_wkt(None) is None

    def test_unclosed_json_ring_closes(self):
        # RFC 7946 requires closed rings, but real-world files omit the
        # repeat point; our reader accepts either (like the reference)
        g = {"type": "Polygon", "coordinates": [[[0, 0], [4, 0], [4, 4]]]}
        assert json_geometry_to_wkt(g) == "POLYGON ((0 0, 4 0, 4 4))"

    def test_unknown_type_raises(self):
        with pytest.raises(ValueError, match="unsupported"):
            json_geometry_to_wkt({"type": "CircularString", "coordinates": []})


class TestFiles:
    def _df(self, spark):
        rows = [(i, w, float(i) * 1.5, f"name{i}") for i, w in enumerate(WKTS[:8])]
        return spark.createDataFrame(rows, "fid long, wkt string, score double, name string")

    def test_seq_write_read(self, spark, tmp_path):
        df = self._df(spark)
        out = str(tmp_path / "seq")
        geojson_lines(df, id_col="fid", property_cols=["score", "name"]).write.text(out)
        back = read_geojson(spark, out + "/*.txt", seq=True).collect()
        got = {r["fid"]: r for r in back}
        assert len(got) == 8
        for r in df.collect():
            b = got[r["fid"]]
            assert b["wkt"] == r["wkt"]
            props = json.loads(b["properties"])
            assert props["name"] == r["name"] and props["score"] == r["score"]

    def test_feature_collection_roundtrip(self, spark, tmp_path):
        df = self._df(spark)
        p = str(tmp_path / "fc.geojson")
        n = write_geojson(df, p, id_col="fid", property_cols=["name"])
        assert n == 8
        doc = json.load(open(p))
        assert doc["type"] == "FeatureCollection" and len(doc["features"]) == 8
        back = {r["fid"]: r["wkt"] for r in read_geojson(spark, p, seq=False).collect()}
        for r in df.collect():
            assert back[r["fid"]] == r["wkt"]

    def test_properties_stay_jvm_projectable(self, spark, tmp_path):
        from pyspark.sql import functions as F

        df = self._df(spark)
        out = str(tmp_path / "seq2")
        geojson_lines(df, id_col="fid", property_cols=["score", "name"]).write.text(out)
        feats = read_geojson(spark, out + "/*.txt", seq=True)
        names = (
            feats.select(F.get_json_object("properties", "$.name").alias("n"))
            .orderBy("n")
            .collect()
        )
        assert [r["n"] for r in names] == sorted(f"name{i}" for i in range(8))

    def test_bare_geometry_lines(self, spark, tmp_path):
        p = tmp_path / "bare.geojsonl"
        p.write_text('{"type": "Point", "coordinates": [3, 4]}\n\n'
                     '\x1e{"type": "Feature", "geometry": {"type": "Point", '
                     '"coordinates": [5, 6]}, "properties": null}\n')
        rows = read_geojson(spark, str(p)).orderBy("wkt").collect()
        assert [r["wkt"] for r in rows] == ["POINT (3 4)", "POINT (5 6)"]
        assert rows[0]["fid"] is None and rows[0]["properties"] is None

    def test_null_geometry_feature(self, spark, tmp_path):
        p = tmp_path / "nullg.geojsonl"
        p.write_text('{"type": "Feature", "id": 7, "geometry": null, '
                     '"properties": {"a": 1}}\n')
        r = read_geojson(spark, str(p)).collect()[0]
        assert r["fid"] == 7 and r["wkt"] is None
        assert json.loads(r["properties"]) == {"a": 1}
