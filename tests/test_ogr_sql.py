"""OGR SQL dialect tests, mirroring the reference's semantics tests
(autotest/ogr/ogr_sql_test.py, SURVEY.md §2.8/§3a): summary records,
DISTINCT, first-match JOIN, OGR null-propagating AND/OR, LIKE
sensitivity, SUBSTR negative start, LIMIT/OFFSET, UNION ALL,
special fields."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from gdal_spark.ogr_sql import execute


@pytest.fixture()
def zones_df(spark):
    # the poly.shp eas_id list (FIXTURES.md F2)
    eas = [168, 179, 171, 173, 172, 169, 166, 158, 165, 170]
    return spark.createDataFrame([Row(fid=i, eas_id=e, prfedea=f"35043411{i}") for i, e in enumerate(eas)])


class TestSummary:
    def test_aggregates_collapse_to_one_row(self, spark, zones_df):
        out = execute(
            spark,
            "SELECT COUNT(*), MIN(eas_id), MAX(eas_id), SUM(eas_id), AVG(eas_id) FROM zones",
            {"zones": zones_df},
        ).collect()
        assert len(out) == 1
        r = out[0]
        # expected values from autotest/ogr/ogr_sql_test.py constants
        assert (r[0], r[1], r[2], r[3], r[4]) == (10, 158, 179, 1691, 169.1)

    def test_count_distinct(self, spark, zones_df):
        out = execute(spark, "SELECT COUNT(DISTINCT eas_id) FROM zones", {"zones": zones_df}).collect()
        assert out[0][0] == 10

    def test_distinct_list(self, spark, zones_df):
        out = execute(
            spark, "SELECT DISTINCT eas_id FROM zones WHERE eas_id < 170", {"zones": zones_df}
        ).collect()
        assert sorted(r.eas_id for r in out) == [158, 165, 166, 168, 169]


class TestNullSemantics:
    def test_true_or_null_is_null(self, spark):
        df = spark.createDataFrame([Row(a=1, b=None), Row(a=1, b=2), Row(a=0, b=None)], "a int, b int")
        # OGR: (a = 1 OR b = 2) with b NULL -> NULL -> row dropped,
        # even though a = 1 is TRUE (swq_op_general.cpp null loop)
        out = execute(spark, "SELECT a FROM t WHERE a = 1 OR b = 2", {"t": df}).collect()
        assert [r.a for r in out] == [1]

    def test_spark_sql_differs(self, spark):
        # contrast: the SQLITE dialect (plain SQL 3VL) keeps the row
        df = spark.createDataFrame([Row(a=1, b=None)], "a int, b int")
        out = execute(spark, "SELECT a FROM t WHERE a = 1 OR b = 2", {"t": df}, dialect="SQLITE").collect()
        assert [r.a for r in out] == [1]

    def test_not_null_propagates(self, spark):
        df = spark.createDataFrame([Row(a=None), Row(a=0)], "a int")
        out = execute(spark, "SELECT a FROM t WHERE NOT (a = 1)", {"t": df}).collect()
        assert [r.a for r in out] == [0]


class TestFirstMatchJoin:
    def test_one_to_one_first_fid(self, spark):
        cust = spark.createDataFrame([Row(ck=1), Row(ck=2), Row(ck=3)])
        orders = spark.createDataFrame(
            [Row(ok=10, ck=1), Row(ok=11, ck=1), Row(ok=12, ck=2)]
        )
        out = execute(
            spark,
            "SELECT ck, ok FROM cust LEFT JOIN orders ON cust.ck = orders.ck",
            {"cust": cust, "orders": orders},
        ).collect()
        got = {r.ck: r.ok for r in out}
        assert len(out) == 3  # 1:1, never 1:N (ogr_gensql.cpp:1515)
        assert got == {1: 10, 2: 12, 3: None}


class TestScalars:
    def test_like_case_sensitive_ilike_not(self, spark):
        df = spark.createDataFrame([Row(s="Red widget"), Row(s="red bolt")])
        like = execute(spark, "SELECT s FROM t WHERE s LIKE 'red%'", {"t": df}).collect()
        ilike = execute(spark, "SELECT s FROM t WHERE s ILIKE 'RED%'", {"t": df}).collect()
        assert [r.s for r in like] == ["red bolt"]
        assert sorted(r.s for r in ilike) == ["Red widget", "red bolt"]

    def test_substr_negative_start(self, spark):
        df = spark.createDataFrame([Row(s="hello")])
        out = execute(spark, "SELECT SUBSTR(s, -3, 3) AS tail FROM t", {"t": df}).collect()
        assert out[0].tail == "llo"

    def test_concat_pipes_and_cast(self, spark):
        df = spark.createDataFrame([Row(a=1, s="x")])
        out = execute(spark, "SELECT s || CAST(a AS character(10)) AS c FROM t", {"t": df}).collect()
        assert out[0].c == "x1"

    def test_hstore_get_value(self, spark):
        df = spark.createDataFrame([Row(h="a=>1,b=>2")])
        out = execute(spark, "SELECT HSTORE_GET_VALUE(h, 'b') AS v FROM t", {"t": df}).collect()
        assert out[0].v == "2"

    def test_between_and_in(self, spark, zones_df):
        out = execute(
            spark,
            "SELECT eas_id FROM zones WHERE eas_id BETWEEN 165 AND 169 AND eas_id IN (165, 166, 179)",
            {"zones": zones_df},
        ).collect()
        assert sorted(r.eas_id for r in out) == [165, 166]


class TestOrderLimit:
    def test_order_limit_offset(self, spark, zones_df):
        out = execute(
            spark,
            "SELECT eas_id FROM zones ORDER BY eas_id DESC LIMIT 3 OFFSET 2",
            {"zones": zones_df},
        ).collect()
        assert [r.eas_id for r in out] == [172, 171, 170]

    def test_order_by_limit_1_top1(self, spark, zones_df):
        out = execute(spark, "SELECT eas_id FROM zones ORDER BY eas_id LIMIT 1", {"zones": zones_df}).collect()
        assert [r.eas_id for r in out] == [158]


class TestUnionAll:
    def test_union_all(self, spark, zones_df):
        out = execute(
            spark,
            "SELECT eas_id FROM zones WHERE eas_id < 160 UNION ALL SELECT eas_id FROM zones WHERE eas_id > 175",
            {"zones": zones_df},
        ).collect()
        assert sorted(r.eas_id for r in out) == [158, 179]


class TestDateLiterals:
    """Date literal comparison in WHERE (OGRField date semantics,
    ogr/ogrfeature.cpp OGRParseDate; swq typed comparison)."""

    def test_date_where_and_minmax(self, spark):
        import datetime

        from gdal_spark.ogr_sql import execute

        df = spark.createDataFrame(
            [
                (1, datetime.date(1995, 3, 1)),
                (2, datetime.date(1996, 7, 15)),
                (3, datetime.date(1997, 1, 2)),
            ],
            "id bigint, d date",
        )
        out = execute(spark, "SELECT id FROM t WHERE d > '1996-01-01'", {"t": df})
        assert sorted(r.id for r in out.collect()) == [2, 3]
        s = execute(
            spark, "SELECT MIN(d) AS lo, MAX(d) AS hi FROM t WHERE d < '1997-01-01'", {"t": df}
        ).collect()[0]
        assert (s.lo, s.hi) == (datetime.date(1995, 3, 1), datetime.date(1996, 7, 15))

    def test_date_between(self, spark):
        import datetime

        from gdal_spark.ogr_sql import execute

        df = spark.createDataFrame(
            [(1, datetime.date(1995, 3, 1)), (2, datetime.date(1996, 7, 15))],
            "id bigint, d date",
        )
        out = execute(
            spark, "SELECT id FROM t WHERE d BETWEEN '1995-01-01' AND '1995-12-31'", {"t": df}
        )
        assert [r.id for r in out.collect()] == [1]
