"""`gdal vector explode` zip semantics
(apps/gdalalg_vector_explode.cpp TranslateFeature): strict-length list
explode, index field, collection-member geometry, the non-collection
quirks, and every reference error path."""

from __future__ import annotations

import pandas as pd
import pytest

from gdal_spark.operators.vector_translate import vector_explode


def _df(spark, **cols):
    return spark.createDataFrame(pd.DataFrame(cols))


def test_zip_lists_with_index_and_collection(spark):
    df = _df(
        spark,
        fid=[1, 2],
        name=["a", "b"],
        vals=[[10, 20, 30], [7, 8, 9]],
        tags=[["x", "y", "z"], ["p", "q", "r"]],
        geom=[
            "MULTIPOINT(0 0,1 1,2 2)",
            "GEOMETRYCOLLECTION(POINT(5 5),LINESTRING(0 0,1 0),POLYGON((0 0,1 0,1 1,0 0)))",
        ],
    )
    out = vector_explode(df, fields=["vals", "tags"], index_field="idx",
                         geometry=True, fid_col="fid")
    rows = sorted(out.collect(), key=lambda r: (r.fid, r.idx))
    assert [r.idx for r in rows] == [0, 1, 2, 0, 1, 2]
    assert [r.vals for r in rows] == [10, 20, 30, 7, 8, 9]
    assert [r.tags for r in rows] == ["x", "y", "z", "p", "q", "r"]
    assert rows[0].geom == "POINT (0 0)"
    assert rows[4].geom == "LINESTRING (0 0,1 0)"
    assert rows[5].geom == "POLYGON ((0 0,1 0,1 1,0 0))"
    assert [r.name for r in rows] == ["a", "a", "a", "b", "b", "b"]
    # index field comes FIRST (reference SetField(0, i), :287)
    assert out.columns[0] == "idx"


def test_non_collection_geometry_rules(spark):
    # N=2 from the list: non-collection geom rides row 0, row 1 NULL
    df = _df(spark, fid=[1], vals=[[1, 2]], geom=["POINT(3 4)"])
    rows = sorted(vector_explode(df, fields=["vals"], geometry=True,
                                 fid_col="fid").collect(), key=lambda r: r.vals)
    assert rows[0].geom == "POINT(3 4)" and rows[1].geom is None
    # N>2 with a non-NULL non-collection geometry errors (:418-431)
    df2 = _df(spark, fid=[1], vals=[[1, 2, 3]], geom=["POINT(3 4)"])
    with pytest.raises(Exception, match="is not a collection"):
        vector_explode(df2, fields=["vals"], geometry=True, fid_col="fid").collect()
    # ...but a NULL geometry never errors: every row NULL
    df3 = _df(spark, fid=[1], vals=[[1, 2, 3]], geom=[None])
    rows3 = vector_explode(df3, fields=["vals"], geometry=True, fid_col="fid").collect()
    assert len(rows3) == 3 and all(r.geom is None for r in rows3)


def test_short_list_and_null_list_error(spark):
    df = _df(spark, fid=[7], a=[[1, 2, 3]], b=[[1]])
    with pytest.raises(Exception, match="'b' of source feature 7 does not have enough"):
        vector_explode(df, fields=["a", "b"], fid_col="fid").collect()
    df2 = spark.createDataFrame([(7, [1, 2], None)], "fid int, a array<int>, b array<int>")
    with pytest.raises(Exception, match="'b' of source feature 7"):
        vector_explode(df2, fields=["a", "b"], fid_col="fid").collect()


def test_exhausted_collection_errors(spark):
    df = _df(spark, fid=[1], vals=[[1, 2, 3]], geom=["MULTIPOINT(0 0,1 1)"])
    with pytest.raises(Exception, match="has 2 elements .expected 3."):
        vector_explode(df, fields=["vals"], geometry=True, fid_col="fid").collect()
    df2 = _df(spark, fid=[1], geom=["MULTIPOINT EMPTY"])
    with pytest.raises(Exception, match="has 0 elements"):
        vector_explode(df2, geometry=True, fid_col="fid").collect()


def test_no_exploded_fields_passthrough(spark):
    # nothing exploded -> N=1, identity (plus geometry passthrough)
    df = _df(spark, fid=[1, 2], v=[5, 6], geom=["POINT(1 1)", None])
    out = vector_explode(df, fid_col="fid")
    assert sorted((r.fid, r.v, r.geom) for r in out.collect()) == [
        (1, 5, "POINT(1 1)"), (2, 6, None)]


def test_non_list_field_rejected(spark):
    df = _df(spark, fid=[1], v=[5])
    with pytest.raises(ValueError, match="not list-typed"):
        vector_explode(df, fields=["v"])
