"""gdal raster reclassify / calc (frmts/vrt/vrtreclassifier.cpp,
apps/gdalalg_raster_calc.cpp)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.calc import (
    compile_expr,
    parse_mapping,
    raster_calc,
    reclassify,
    reclassify_array,
)
from gdal_spark.operators.raster import RasterSpec


class TestMappingParse:
    def test_reference_grammar(self):
        # the autotest mapping (test_gdalalg_raster_reclassify_basic_1)
        parsed = parse_mapping(
            "165 = 120; (-inf, 0) = 140; (0, 100] = 140; (100,  130] = PASS_THROUGH; DEFAULT = 160",
        )
        intervals, nan_dest, default_dest, default_pass = parsed
        assert intervals[0] == (165.0, 165.0, 120.0)
        lo, hi, d = intervals[1]
        # open -inf bound -> nextafter(-inf, +inf) = -DBL_MAX, same as
        # the reference's std::nextafter (vrtreclassifier.cpp:148)
        assert lo == np.nextafter(-np.inf, np.inf) and hi == np.nextafter(0.0, -np.inf) and d == 140.0
        lo, hi, d = intervals[2]
        # open lower bound -> nextafter toward +inf (vrtreclassifier.cpp:148)
        assert lo == np.nextafter(0.0, np.inf) and hi == 100.0
        assert intervals[3][2] is None  # PASS_THROUGH
        assert default_dest == 160.0 and default_pass is False and nan_dest is None

    def test_nodata_source_and_dest(self):
        parsed = parse_mapping("NO_DATA = 1; 5 = NO_DATA", src_nodata=0.0, dst_nodata=255.0)
        intervals = parsed[0]
        assert intervals[0] == (0.0, 0.0, 1.0)
        assert intervals[1] == (5.0, 5.0, 255.0)

    def test_nodata_without_value_errors(self):
        with pytest.raises(ValueError):
            parse_mapping("NO_DATA = 1")

    def test_bad_interval_errors(self):
        with pytest.raises(ValueError):
            parse_mapping("(5, 1] = 2")


class TestReclassifyArray:
    def test_semantics(self):
        parsed = parse_mapping("165 = 120; (-inf, 0) = 140; (0, 100] = 140; (100, 130] = PASS_THROUGH; DEFAULT = 160")
        a = np.array([[165.0, -3.0, 50.0, 120.0, 200.0, 0.0]])
        out = reclassify_array(a, parsed)
        # 0.0 matches no interval (both neighbors open at 0) -> DEFAULT
        np.testing.assert_array_equal(out, [[120.0, 140.0, 140.0, 120.0, 160.0, 160.0]])

    def test_unmatched_without_default_raises(self):
        parsed = parse_mapping("1 = 2")
        with pytest.raises(ValueError, match="no specified mapping"):
            reclassify_array(np.array([[7.0]]), parsed)

    def test_nan_mapping(self):
        parsed = parse_mapping("NAN = 9; DEFAULT = PASS_THROUGH")
        out = reclassify_array(np.array([[np.nan, 3.0]]), parsed)
        np.testing.assert_array_equal(out, [[9.0, 3.0]])


class TestDistributed:
    def test_reclassify_tiles(self, spark):
        tiles = byte20_tiles(spark)
        out = reclassify(
            tiles, BYTE20_SPEC, "[0, 120] = 0; DEFAULT = 1", out_dtype="uint8"
        )
        got = np.zeros((20, 20), dtype=np.uint8)
        for r in out.collect():
            t = np.frombuffer(r.payload, dtype=r.dtype).reshape(r.h, r.w)
            got[r.ty * 16 : r.ty * 16 + r.h, r.tx * 16 : r.tx * 16 + r.w] = t
        np.testing.assert_array_equal(got, (BYTE20 > 120).astype(np.uint8))

    def test_calc_two_rasters(self, spark):
        a = byte20_tiles(spark)
        b = byte20_tiles(spark)
        out = raster_calc({"A": a, "B": b}, BYTE20_SPEC, "A + 0.5 * B")
        got = np.zeros((20, 20))
        for r in out.collect():
            t = np.frombuffer(r.payload, dtype=r.dtype).reshape(r.h, r.w)
            got[r.ty * 16 : r.ty * 16 + r.h, r.tx * 16 : r.tx * 16 + r.w] = t
        np.testing.assert_array_equal(got, BYTE20 * 1.5)

    def test_calc_where_expression(self, spark):
        a = byte20_tiles(spark)
        out = raster_calc({"A": a}, BYTE20_SPEC, "where(A > 128, 1.0, 0.0)")
        got = np.zeros((20, 20))
        for r in out.collect():
            t = np.frombuffer(r.payload, dtype=r.dtype).reshape(r.h, r.w)
            got[r.ty * 16 : r.ty * 16 + r.h, r.tx * 16 : r.tx * 16 + r.w] = t
        np.testing.assert_array_equal(got, (BYTE20 > 128).astype(np.float64))


class TestExprSafety:
    def test_unknown_identifier_rejected(self):
        with pytest.raises(ValueError, match="unknown identifier"):
            compile_expr("__import__('os')", ["A"])
        with pytest.raises(ValueError, match="unknown identifier"):
            compile_expr("A + B", ["A"])
