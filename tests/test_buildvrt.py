"""gdalbuildvrt planning: strategies, gcd, -tap, GetSrcDstWin parity
vs a literal scalar replica."""

from __future__ import annotations

import math

import pytest

from gdal_spark.operators.buildvrt import (
    VRTGrid,
    build_vrt_plan,
    float_to_fraction,
    greatest_common_divisor,
)


def _src_dst_win(src, res_we, res_ns, minx, miny, maxx, maxy, xsize, ysize):
    """Literal GetSrcDstWin (gdalbuildvrt_lib.cpp:117-198)."""
    tlx, tly, s_we, s_ns, sx, sy = src
    if tlx + sx * s_we <= minx:
        return None
    if tlx >= maxx:
        return None
    if tly + sy * s_ns >= maxy:
        return None
    if tly <= miny:
        return None
    if tlx < minx:
        src_xoff = (minx - tlx) / s_we
        dst_xoff = 0.0
    else:
        src_xoff = 0.0
        dst_xoff = (tlx - minx) / res_we
    if maxy < tly:
        src_yoff = (tly - maxy) / -s_ns
        dst_yoff = 0.0
    else:
        src_yoff = 0.0
        dst_yoff = (maxy - tly) / -res_ns
    src_xsize = float(sx)
    src_ysize = float(sy)
    if src_xoff > 0:
        src_xsize -= src_xoff
    if src_yoff > 0:
        src_ysize -= src_yoff
    fx = s_we / res_we
    dst_xsize = src_xsize * fx
    fy = s_ns / res_ns
    dst_ysize = src_ysize * fy
    if dst_xoff + dst_xsize > xsize:
        dst_xsize = xsize - dst_xoff
        src_xsize = dst_xsize / fx
    if dst_yoff + dst_ysize > ysize:
        dst_ysize = ysize - dst_yoff
        src_ysize = dst_ysize / fy
    if src_xsize > 0 and dst_xsize > 0 and src_ysize > 0 and dst_ysize > 0:
        return (src_xoff, src_yoff, src_xsize, src_ysize,
                dst_xoff, dst_yoff, dst_xsize, dst_ysize)
    return None


SOURCES = [
    # (src_id, tlx, tly, we_res, ns_res, xsize, ysize)
    (1, 0.0, 1000.0, 32.0, -32.0, 20, 15),
    (2, 512.0, 1320.0, 64.0, -64.0, 10, 12),
    (3, -320.0, 800.0, 32.0, -16.0, 8, 30),
    (4, 5000.0, 900.0, 32.0, -32.0, 4, 4),     # disjoint in x for -te cases
    (5, 100.0, 1500.0, 16.0, -32.0, 50, 10),
]


def _df(spark, rows=SOURCES):
    return spark.createDataFrame(
        rows,
        "src_id int, tlx double, tly double, we_res double, ns_res double, xsize int, ysize int",
    )


class TestGCD:
    def test_known_values(self):
        assert greatest_common_divisor(30.0, 45.0) == 15.0
        assert greatest_common_divisor(32.0, 64.0) == 32.0  # integer-factor fast path
        assert greatest_common_divisor(1 / 3, 1 / 4) == pytest.approx(1 / 12, rel=1e-12)
        assert greatest_common_divisor(0.0, 3.0) == 0.0
        # excessive disaggregation guard
        assert greatest_common_divisor(10000.5, 1.0) == 0.0

    def test_fraction(self):
        assert float_to_fraction(0.25) == (1, 4)
        n, d = float_to_fraction(1 / 3)
        assert abs(n / d - 1 / 3) < 1e-10


class TestStrategies:
    def test_average(self, spark):
        grid, _ = build_vrt_plan(_df(spark), resolution="average")
        assert grid.we_res == pytest.approx((32 + 64 + 32 + 32 + 16) / 5)
        assert grid.ns_res == pytest.approx(-(32 + 64 + 16 + 32 + 32) / 5)

    def test_highest_lowest(self, spark):
        g_hi, _ = build_vrt_plan(_df(spark), resolution="highest")
        assert (g_hi.we_res, g_hi.ns_res) == (16.0, -16.0)
        g_lo, _ = build_vrt_plan(_df(spark), resolution="lowest")
        assert (g_lo.we_res, g_lo.ns_res) == (64.0, -64.0)

    def test_common(self, spark):
        g, _ = build_vrt_plan(_df(spark), resolution="common")
        assert (g.we_res, g.ns_res) == (16.0, -16.0)

    def test_same_rejects_heterogeneous(self, spark):
        with pytest.raises(ValueError, match="heterogeneous"):
            build_vrt_plan(_df(spark), resolution="same")
        rows = [(1, 0.0, 100.0, 2.0, -2.0, 5, 5), (2, 10.0, 90.0, 2.0, -2.0, 5, 5)]
        g, _ = build_vrt_plan(_df(spark, rows), resolution="same")
        assert (g.we_res, g.ns_res) == (2.0, -2.0)

    def test_user_and_extent(self, spark):
        g, plan = build_vrt_plan(
            _df(spark), resolution="user", we_res=32.0, ns_res=32.0,
            extent=(0.0, 500.0, 1000.0, 1500.0),
        )
        assert (g.minx, g.maxy, g.xsize, g.ysize) == (0.0, 1500.0, 31, 31)
        kept = {r.src_id for r in plan.collect()}
        assert 4 not in kept  # disjoint source dropped

    def test_tap(self, spark):
        rows = [(1, 10.0, 95.0, 32.0, -32.0, 5, 5)]
        g, _ = build_vrt_plan(_df(spark, rows), resolution="highest",
                              target_aligned_pixels=True)
        assert g.minx == 0.0 and g.maxy == 96.0
        assert g.minx % 32 == 0 and g.maxy % 32 == 0


class TestWindows:
    @pytest.mark.parametrize("strategy", ["average", "highest", "lowest", "common"])
    def test_plan_matches_scalar(self, spark, strategy):
        grid, plan = build_vrt_plan(_df(spark), resolution=strategy)
        got = {r.src_id: (r.src_xoff, r.src_yoff, r.src_xsize, r.src_ysize,
                          r.dst_xoff, r.dst_yoff, r.dst_xsize, r.dst_ysize)
               for r in plan.collect()}
        want = {}
        for s in SOURCES:
            w = _src_dst_win(
                s[1:], grid.we_res, grid.ns_res,
                grid.minx, grid.miny, grid.maxx, grid.maxy, grid.xsize, grid.ysize,
            )
            if w is not None:
                want[s[0]] = w
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=0, abs=0), k

    def test_user_extent_clips_windows(self, spark):
        grid, plan = build_vrt_plan(
            _df(spark), resolution="user", we_res=32.0, ns_res=32.0,
            extent=(64.0, 500.0, 640.0, 1400.0),
        )
        for r in plan.collect():
            assert r.dst_xoff >= 0 and r.dst_yoff >= 0
            assert r.dst_xoff + r.dst_xsize <= grid.xsize + 1e-9
            assert r.dst_yoff + r.dst_ysize <= grid.ysize + 1e-9
            s = next(x for x in SOURCES if x[0] == r.src_id)
            w = _src_dst_win(s[1:], grid.we_res, grid.ns_res,
                             grid.minx, grid.miny, grid.maxx, grid.maxy,
                             grid.xsize, grid.ysize)
            assert (r.src_xoff, r.src_yoff, r.src_xsize, r.src_ysize,
                    r.dst_xoff, r.dst_yoff, r.dst_xsize, r.dst_ysize) == w

    def test_separate_band_numbering(self, spark):
        _, plan = build_vrt_plan(_df(spark), resolution="highest", separate=True)
        rows = sorted(plan.collect(), key=lambda r: r.src_id)
        assert [r.band for r in rows] == list(range(1, len(rows) + 1))
