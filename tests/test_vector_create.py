"""`gdal vector create` (apps/gdalalg_vector_create.cpp) — empty
dataset/layer creation with the reference's field grammar, geometry
type parsing, and exists/update/overwrite-layer contract."""

import json
import os

import pytest

from gdal_spark.metrics import LINEAGE_FILE
from gdal_spark.operators.create import (
    parse_field_definition,
    parse_ogc_geom_type,
    vector_create,
)


class TestFieldGrammar:
    # gdalalgorithm.cpp:5384 ParseFieldDefinition
    def test_name_type(self):
        rec = parse_field_definition("pop:Integer64")
        assert rec == {"name": "pop", "type": "Integer64",
                       "spark_type": "bigint", "width": 0, "precision": 0}

    def test_width_precision(self):
        rec = parse_field_definition("val:Real(12,3)")
        assert (rec["type"], rec["width"], rec["precision"]) == ("Real", 12, 3)

    def test_width_only(self):
        rec = parse_field_definition("name:String(80)")
        assert (rec["type"], rec["width"], rec["precision"]) == ("String", 80, 0)

    def test_case_insensitive_type(self):
        assert parse_field_definition("a:integer")["type"] == "Integer"
        assert parse_field_definition("a:DATETIME")["type"] == "DateTime"

    def test_unknown_type_errors(self):
        # GetFieldTypeByName returns String for unknowns; the parser
        # rejects unless the literal text is String
        with pytest.raises(ValueError, match="Unsupported field type: Varchar"):
            parse_field_definition("a:Varchar")

    def test_bad_format_errors(self):
        for bad in ("noseparator", "a:Real(x)", "a:Real(3,)", "a:"):
            with pytest.raises(ValueError, match="Invalid field definition"):
                parse_field_definition(bad)

    def test_all_types_map(self):
        for t, st in [("Integer", "int"), ("IntegerList", "array<int>"),
                      ("Real", "double"), ("RealList", "array<double>"),
                      ("String", "string"), ("StringList", "array<string>"),
                      ("Binary", "binary"), ("Date", "date"),
                      ("Time", "string"), ("DateTime", "timestamp"),
                      ("Integer64", "bigint"), ("Integer64List", "array<bigint>")]:
            assert parse_field_definition(f"f:{t}")["spark_type"] == st


class TestGeomTypeParse:
    # ogrgeometry.cpp:2646 OGRFromOGCGeomType
    def test_basic(self):
        assert parse_ogc_geom_type("POINT") == "POINT"
        assert parse_ogc_geom_type("MultiPolygon") == "MULTIPOLYGON"
        assert parse_ogc_geom_type("CURVEPOLYGON") == "CURVEPOLYGON"

    def test_zm_suffixes(self):
        assert parse_ogc_geom_type("POINTZ") == "POINT Z"
        assert parse_ogc_geom_type("POINT ZM") == "POINT ZM"
        assert parse_ogc_geom_type("LINESTRINGM") == "LINESTRING M"

    def test_unknown(self):
        assert parse_ogc_geom_type("BLOB") == "Unknown"


class TestVectorCreate:
    def test_create_fields_and_geom(self, spark, tmp_path):
        p = str(tmp_path / "towns.db")
        rec = vector_create(
            spark, p,
            fields=["name:String(80)", "pop:Integer64", "area:Real(12,3)"],
            geometry_type="POINT", crs="EPSG:4326", fid="gid",
        )
        # default layer name = basename minus extension (:127-129)
        assert list(rec["layers"]) == ["towns"]
        meta = rec["layers"]["towns"]
        assert [f["name"] for f in meta["fields"]] == ["name", "pop", "area"]
        assert meta["fields"][2] == {"name": "area", "type": "Real",
                                     "width": 12, "precision": 3}
        assert meta["geometry_fields"] == [
            {"name": "geom", "type": "POINT", "crs": "EPSG:4326"}]
        assert meta["fid"] == "gid"
        # zero-row parquet with the mapped Spark schema
        df = spark.read.parquet(os.path.join(p, "towns"))
        assert df.count() == 0
        assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields) \
            == {"name": "string", "pop": "bigint", "area": "double", "geom": "string"}
        with open(os.path.join(p, LINEAGE_FILE)) as f:
            assert json.load(f)["layers"] == ["towns"]

    def test_exists_requires_update(self, spark, tmp_path):
        p = str(tmp_path / "d")
        vector_create(spark, p, fields=["a:Integer"])
        with pytest.raises(FileExistsError, match="already exists"):
            vector_create(spark, p, layer_name="other", fields=["b:Integer"])
        # update mode adds a second layer
        vector_create(spark, p, layer_name="other", fields=["b:Integer"],
                      update=True)
        with open(os.path.join(p, LINEAGE_FILE)) as f:
            assert json.load(f)["layers"] == ["d", "other"]

    def test_overwrite_layer_contract(self, spark, tmp_path):
        p = str(tmp_path / "d")
        vector_create(spark, p, layer_name="roads", fields=["a:Integer"])
        with pytest.raises(FileExistsError, match="already exists. Specify"):
            vector_create(spark, p, layer_name="roads", fields=["b:Real"],
                          update=True)
        vector_create(spark, p, layer_name="roads", fields=["b:Real"],
                      update=True, overwrite_layer=True)
        df = spark.read.parquet(os.path.join(p, "roads"))
        assert [f.name for f in df.schema.fields] == ["b"]
        # overwrite-layer naming a missing layer: "Cannot find layer"
        with pytest.raises(ValueError, match="Cannot find layer"):
            vector_create(spark, p, layer_name="rivers", fields=["c:Real"],
                          update=True, overwrite_layer=True)

    def test_duplicate_field_errors(self, spark, tmp_path):
        with pytest.raises(ValueError, match="Duplicate field name"):
            vector_create(spark, str(tmp_path / "x"),
                          fields=["a:Integer", "A:Real"])

    def test_unknown_geometry_type_errors(self, spark, tmp_path):
        with pytest.raises(ValueError, match="Unsupported geometry type"):
            vector_create(spark, str(tmp_path / "x"), geometry_type="BLOB")
        # GEOMETRY* escapes the error (:362-364)
        rec = vector_create(spark, str(tmp_path / "y"),
                            geometry_type="GEOMETRY")
        assert rec["layers"]["y"]["geometry_fields"][0]["type"] == "Unknown"

    def test_schema_like_mutex(self, spark, tmp_path):
        with pytest.raises(ValueError, match="must not be specified"):
            vector_create(spark, str(tmp_path / "x"),
                          schema={"layers": [{"name": "a", "fields": []}]},
                          fields=["a:Integer"])
        with pytest.raises(ValueError, match="must not be specified"):
            vector_create(spark, str(tmp_path / "x"),
                          schema={"layers": [{"name": "a", "fields": []}]},
                          crs="EPSG:4326")

    def test_schema_multi_layer(self, spark, tmp_path):
        p = str(tmp_path / "multi")
        schema = {"layers": [
            {"name": "a", "fields": [{"name": "x", "type": "Integer"}],
             "geometry_fields": []},
            {"name": "b", "fields": [{"name": "y", "type": "Real",
                                      "width": 8, "precision": 2}],
             "geometry_fields": [{"name": "geom", "type": "POLYGON"}]},
        ]}
        rec = vector_create(spark, p, schema=schema)
        assert sorted(rec["layers"]) == ["a", "b"]
        assert rec["layers"]["b"]["fields"][0]["width"] == 8
        # explicit output layer name + multiple schema layers errors
        with pytest.raises(ValueError, match="multiple layers"):
            vector_create(spark, str(tmp_path / "m2"), schema=schema,
                          layer_name="z")
        # ...but selecting exactly one input layer allows the rename
        rec = vector_create(spark, str(tmp_path / "m3"), schema=schema,
                            layer_name="z", input_layers=["b"])
        assert list(rec["layers"]) == ["z"]
        # unknown input layer name errors
        with pytest.raises(ValueError, match="doesn't exist"):
            vector_create(spark, str(tmp_path / "m4"), schema=schema,
                          input_layers=["nope"])

    def test_like_template(self, spark, tmp_path):
        template = spark.createDataFrame(
            [(1, "x", 2.0, "POINT (0 0)")], "fid int, name string, v double, wkt string")
        rec = vector_create(spark, str(tmp_path / "liked"), like=template,
                            like_name="src")
        meta = rec["layers"]["src"]
        assert [f["type"] for f in meta["fields"]] == ["Integer", "String", "Real"]
        assert meta["geometry_fields"][0]["name"] == "wkt"
        df = spark.read.parquet(str(tmp_path / "liked" / "src"))
        assert df.count() == 0
        assert "wkt" in df.columns
