"""OGR CSV driver semantics tests (operators/csv_layer.py). Mirrors
the reference's autotest/ogr/ogr_csv.py shapes: .csvt typing, WKT
auto-detection, X/Y open options, quoting round-trips."""

from __future__ import annotations

import os

import pytest

from gdal_spark.operators.csv_layer import (
    escape_csv_field,
    format_csv_line,
    parse_csv_line,
    parse_csvt,
    read_csv_layer,
    write_csv_layer,
)

# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


def test_csvt_parse():
    assert parse_csvt('Integer(5),Real(10.4),String,WKT,CoordX,CoordY\n') == [
        "integer", "real", "string", "wkt", "coordx", "coordy",
    ]
    # quoted tokens (the reference's CSVReadParseLine3L accepts them)
    assert parse_csvt('"Integer64","DateTime"') == ["integer64", "datetime"]


def test_field_escaping_rules():
    assert escape_csv_field("plain") == "plain"
    assert escape_csv_field('say "hi"') == '"say ""hi"""'
    assert escape_csv_field("a,b") == '"a,b"'
    assert escape_csv_field("nl\nx") == '"nl\nx"'
    assert escape_csv_field(None) == ""
    assert escape_csv_field(7) == "7"


def test_line_roundtrip():
    vals = ["a,b", 'q"q', "plain", None, "x\ny", ""]
    line = format_csv_line(vals)
    back = parse_csv_line(line)
    # None survives as None (empty unquoted); "" round-trips quoted? no:
    # empty string writes as unquoted empty -> None on parse (OGR treats
    # empty CSV fields as null strings)
    assert back == ["a,b", 'q"q', "plain", None, "x\ny", None]


def test_parse_trailing_separator():
    assert parse_csv_line("a,b,") == ["a", "b", None]
    assert parse_csv_line('"",x') == ["", "x"]


# ---------------------------------------------------------------------------
# file round-trips
# ---------------------------------------------------------------------------

ROWS = [
    (0, "POINT (30 10)", "al,pha", 7, 1.5),
    (1, "LINESTRING (0 0, 4 3)", 'be"ta', -2, -0.25),
    (2, "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))", "gamma", 9, 2.5),
    (3, None, None, 0, 0.0),
]
SCHEMA = "fid long, wkt string, name string, n long, x double"


def test_single_file_roundtrip(spark, tmp_path):
    path = str(tmp_path / "layer.csv")
    df = spark.createDataFrame(ROWS, SCHEMA)
    info = write_csv_layer(df, path, order_col="fid")
    assert info["records"] == 4 and info["columns"][0] == "WKT"
    # .csvt sidecar written with the geometry + typed attrs
    with open(str(tmp_path / "layer.csvt")) as fh:
        assert fh.read().strip() == "WKT,Integer64,String,Integer64,Real"
    # raw first line: header with geometry column first
    with open(path) as fh:
        assert fh.readline().strip() == "WKT,fid,name,n,x"
    back = read_csv_layer(spark, path, multi_line=True)
    got = {r["fid"]: (r["wkt"], r["name"], r["n"], r["x"]) for r in back.collect()}
    for fid, wkt, name, n, x in ROWS:
        assert got[fid] == (wkt, name, n, x), fid
    # .csvt drove the casts
    dt = dict((f.name, f.dataType.simpleString()) for f in back.schema.fields)
    assert dt["fid"] == "bigint" and dt["x"] == "double" and dt["name"] == "string"


def test_wkt_autodetect_without_csvt(spark, tmp_path):
    path = str(tmp_path / "auto.csv")
    df = spark.createDataFrame(ROWS, SCHEMA)
    write_csv_layer(df, path, order_col="fid", create_csvt=False)
    assert not os.path.exists(str(tmp_path / "auto.csvt"))
    back = read_csv_layer(spark, path, multi_line=True)
    assert "wkt" in back.columns
    assert back.filter("wkt = 'POINT (30 10)'").count() == 1


def test_xy_possible_names(spark, tmp_path):
    path = str(tmp_path / "pts.csv")
    with open(path, "w") as fh:
        fh.write("name,Longitude,latitude\n")
        fh.write("a,12.5,-3.25\n")
        fh.write("b,,7\n")  # missing x -> null geometry
    out = read_csv_layer(
        spark, path,
        x_possible_names=("lon", "longitude"),
        y_possible_names=("lat", "latitude"),
        keep_geom_columns=False,
    )
    rows = {r["name"]: r["wkt"] for r in out.collect()}
    assert rows["a"] == "POINT (12.5 -3.25)"
    assert rows["b"] is None
    assert "Longitude" not in out.columns and "latitude" not in out.columns


def test_as_xy_write(spark, tmp_path):
    path = str(tmp_path / "xy.csv")
    df = spark.createDataFrame(
        [(0, "POINT (30 10)", "a"), (1, "POINT (-2.5 4)", "b")],
        "fid long, wkt string, name string",
    )
    write_csv_layer(df, path, order_col="fid", geometry="AS_XY")
    with open(path) as fh:
        assert fh.readline().strip() == "X,Y,fid,name"
        assert fh.readline().strip() == "30.0,10.0,0,a"
    with open(str(tmp_path / "xy.csvt")) as fh:
        assert fh.read().strip() == "CoordX,CoordY,Integer64,String"
    # CoordX/CoordY from the sidecar drive point reassembly
    back = read_csv_layer(spark, path)
    rows = {r["fid"]: r["wkt"] for r in back.collect()}
    assert rows[0] == "POINT (30.0 10.0)"


def test_distributed_directory_roundtrip(spark, tmp_path):
    path = str(tmp_path / "big_csv")
    rows = [(i, f"POINT ({i} {i % 7})", f"v,{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "fid long, wkt string, name string").repartition(8)
    info = write_csv_layer(df, path, distributed=True)
    assert info["mode"] == "distributed"
    parts = [f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".csv")]
    assert len(parts) >= 2  # genuinely multi-part
    back = read_csv_layer(spark, os.path.join(path, "*.csv"))
    assert back.count() == 200
    got = {int(r["fid"]): (r["wkt"], r["name"]) for r in back.collect()}
    assert got[13] == ("POINT (13 6)", "v,13")


def test_order_col_validation(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="order_col"):
        write_csv_layer(df, str(tmp_path / "x.csv"), order_col="nope")
