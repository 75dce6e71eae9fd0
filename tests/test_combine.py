"""gdal vector combine (gdalalg_vector_combine.cpp)."""

from __future__ import annotations

from gdal_spark.relational import combine


class TestCombine:
    def test_types_and_flattening(self, spark):
        df = spark.createDataFrame(
            [
                ("a", 1, "POINT (1 2)", 7),
                ("a", 2, "MULTIPOINT (3 4,5 6)", 7),
                ("b", 3, "POINT (0 0)", 8),
                ("b", 4, "LINESTRING (0 0,1 1)", 9),
                ("c", 5, None, 1),
                ("c", 6, "POLYGON ((0 0,2 0,2 2,0 2,0 0))", 1),
            ],
            "k string, i long, wkt string, v long",
        )
        rows = {
            r["k"]: r
            for r in combine(
                df, ["k"], order_col="i",
                add_extra_fields="sometimes-identical", extra_fields=["v"],
            ).collect()
        }
        # multipart member components flatten into the typed multi
        assert rows["a"]["wkt"] == "MULTIPOINT ((1 2),(3 4),(5 6))"
        # mixed member types -> GEOMETRYCOLLECTION
        assert rows["b"]["wkt"] == "GEOMETRYCOLLECTION (POINT (0 0),LINESTRING (0 0,1 1))"
        # null geometry skipped; single polygon still wraps as multi
        assert rows["c"]["wkt"] == "MULTIPOLYGON (((0 0,2 0,2 2,0 2,0 0)))"
        # sometimes-identical: uniform groups copy, mixed get NULL
        assert rows["a"]["v"] == 7 and rows["c"]["v"] == 1 and rows["b"]["v"] is None

    def test_always_identical_drops_column_with_any_mixed_group(self, spark):
        df = spark.createDataFrame(
            [("a", 1, "POINT (0 0)", 5), ("a", 2, "POINT (1 1)", 5),
             ("b", 3, "POINT (2 2)", 6), ("b", 4, "POINT (3 3)", 7)],
            "k string, i long, wkt string, v long",
        )
        out = combine(df, ["k"], order_col="i",
                      add_extra_fields="always-identical", extra_fields=["v"])
        assert "v" not in out.columns  # group b is mixed -> dropped everywhere

    def test_all_null_group(self, spark):
        df = spark.createDataFrame([("a", 1, None)], "k string, i long, wkt string")
        assert combine(df, ["k"], order_col="i").first()["wkt"] is None
