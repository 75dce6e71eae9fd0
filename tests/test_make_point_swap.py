"""make-point + swap-xy (gdalalg_vector_make_point.cpp /
gdalalg_vector_swap_xy.cpp)."""

from __future__ import annotations

from gdal_spark.operators.vector_translate import make_point, swap_xy


class TestMakePoint:
    def test_string_fields_and_z(self, spark):
        df = spark.createDataFrame(
            [("1.5", "2", "3"), ("-4", "5.25", None), ("junk", "1", "2")],
            "xs string, ys string, zs string",
        )
        rows = make_point(df, "xs", "ys").select("wkt").collect()
        assert [r["wkt"] for r in rows] == ["POINT (1.5 2)", "POINT (-4 5.25)", None]
        rows = make_point(df, "xs", "ys", "zs").select("wkt").collect()
        assert rows[0]["wkt"] == "POINT Z (1.5 2 3)"
        assert rows[1]["wkt"] is None  # z missing
        assert rows[2]["wkt"] is None  # x unparseable

    def test_numeric_fields(self, spark):
        df = spark.createDataFrame([(10.0, -0.5)], "x double, y double")
        assert make_point(df, "x", "y").first()["wkt"] == "POINT (10 -0.5)"


class TestSwapXY:
    def test_all_types(self, spark):
        wkts = [
            "POINT (1 2)",
            "MULTILINESTRING ((0 1,2 3),(4 5,6 7))",
            "POLYGON ((0 0,4 0,4 2,0 0),(1 0.5,2 0.5,2 1,1 0.5))",
            None,
            "not wkt",
        ]
        df = spark.createDataFrame([(w,) for w in wkts], "wkt string")
        got = [r["wkt"] for r in swap_xy(df).collect()]
        assert got[0] == "POINT (2 1)"
        assert got[1] == "MULTILINESTRING ((1 0,3 2),(5 4,7 6))"
        assert got[2] == "POLYGON ((0 0,0 4,2 4,0 0),(0.5 1,0.5 2,1 2,0.5 1))"
        assert got[3] is None
        assert got[4] == "not wkt"  # invalid passes through unchanged

    def test_involution(self, spark):
        wkts = ["POINT (3.25 -7)", "LINESTRING (0 1,2 3,4 5)"]
        df = spark.createDataFrame([(w,) for w in wkts], "wkt string")
        got = [r["wkt"] for r in swap_xy(swap_xy(df)).collect()]
        assert got == wkts
