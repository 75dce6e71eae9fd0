"""`gdal vector set-field-type` OGR SetField coercions
(ogr/ogrfeature.cpp:3981 SetField(double), :4181 SetField(char*))."""

from __future__ import annotations

import pandas as pd
import pytest

from gdal_spark.relational import set_field_type

I32MIN, I32MAX = -2147483648, 2147483647


def _vals(spark, src_type, values, new_type):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], f"i int, f {src_type}")
    out = set_field_type(df, "f", new_type)
    return [r.f for r in out.orderBy("i").collect()]


def test_string_to_int_prefix_parse_and_clamp(spark):
    got = _vals(spark, "string",
                ["42", "  -7abc", "abc", "", "3.9", "+12", "99999999999999999999", None],
                "int")
    # strtoll prefix parse; "3.9" parses "3"; no digits -> 0; clamp
    assert got == [42, -7, 0, 0, 3, 12, I32MAX, None]


def test_string_to_bigint(spark):
    got = _vals(spark, "string", ["12345678901", "-99999999999999999999", "x"], "bigint")
    assert got == [12345678901, -9223372036854775808, 0]


def test_string_to_double_prefix(spark):
    got = _vals(spark, "string",
                ["1.5", " -2.25e2xyz", ".5", "nope", "", "7", None], "double")
    assert got == [1.5, -225.0, 0.5, 0.0, 0.0, 7.0, None]


def test_double_to_int_trunc_clamp_nan(spark):
    got = _vals(spark, "double",
                [3.9, -3.9, 1e20, -1e20, float("nan"), None], "int")
    # truncate toward zero; clamp; NaN -> INT_MIN (ogrfeature.cpp:3997)
    assert got == [3, -3, I32MAX, I32MIN, I32MIN, None]


def test_double_to_string_c_g16(spark):
    got = _vals(spark, "double", [1.5, 0.1, 3.0, 12345678901234567.0, None], "string")
    assert got == ["1.5", "0.1", "3", "1.234567890123457e+16", None]


def test_int_to_string_and_bigint_to_int(spark):
    assert _vals(spark, "int", [42, -7, None], "string") == ["42", "-7", None]
    assert _vals(spark, "bigint", [12345678901, -12345678901, 5, None], "int") == [
        I32MAX, I32MIN, 5, None]


def test_same_type_passthrough_and_bad_target(spark):
    df = spark.createDataFrame([(1, "x")], "i int, f string")
    assert set_field_type(df, "f", "string") is df
    with pytest.raises(ValueError, match="unsupported target"):
        set_field_type(df, "f", "date")


def test_string_to_int_beyond_decimal38(spark):
    huge = "9" * 45
    got = _vals(spark, "string", [huge, "-" + huge], "bigint")
    assert got == [9223372036854775807, -9223372036854775808]
