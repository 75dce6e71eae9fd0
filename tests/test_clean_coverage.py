"""clean-coverage overlap resolution (gdalalg_vector_clean_coverage.cpp,
GEOS CoverageCleaner merge strategies)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.operators.coverage import (
    clean_coverage,
    clean_coverage_patch,
    invalid_boundary_pieces,
)


def ring(*pts):
    return np.array(list(pts) + [pts[0]], float)


def area(rings):
    a = 0.0
    for k, r in enumerate(rings):
        x, y = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        a += abs(0.5 * np.sum(x * y2 - x2 * y)) * (1 if k == 0 else -1)
    return a


A = [ring((0, 0), (12, 0), (12, 10), (0, 10))]
B = [ring((10, 0), (20, 0), (20, 10), (10, 10))]


class TestStrategies:
    def test_longest_border_tie_lower_index(self):
        out = clean_coverage_patch([0, 1], [A, B], "longest-border")
        assert [round(area(r), 9) for r in out] == [120.0, 80.0]
        assert invalid_boundary_pieces(out[0], out[1]) == []
        assert invalid_boundary_pieces(out[1], out[0]) == []

    def test_longest_border_asymmetric(self):
        # small square overlapping a big one along a short edge: the
        # big polygon shares the longer border with the overlap
        big = [ring((0, 0), (20, 0), (20, 20), (0, 20))]
        small = [ring((18, 8), (24, 8), (24, 12), (18, 12))]
        out = clean_coverage_patch([0, 1], [big, small], "longest-border")
        # overlap (18..20 x 8..12): border toward big's remainder =
        # small's edges inside big (2+4+2=8); toward small's remainder
        # = big's edge inside small (4) -> big wins
        assert round(area(out[0]), 9) == 400.0
        assert round(area(out[1]), 9) == 16.0

    def test_area_strategies(self):
        assert [round(area(r)) for r in clean_coverage_patch([0, 1], [A, B], "max-area")] == [120, 80]
        assert [round(area(r)) for r in clean_coverage_patch([0, 1], [A, B], "min-area")] == [100, 100]

    def test_min_index_respects_fids(self):
        out = clean_coverage_patch([7, 3], [A, B], "min-index")
        assert [round(area(r)) for r in out] == [100, 100]  # B (fid 3) wins

    def test_union_area_preserved(self):
        for strat in ("longest-border", "max-area", "min-area", "min-index"):
            out = clean_coverage_patch([0, 1], [A, B], strat)
            assert abs(sum(area(r) for r in out) - 200.0) < 1e-9, strat


class TestSpark:
    def test_operator(self, spark):
        df = spark.createDataFrame(
            [(0, "POLYGON ((0 0,12 0,12 10,0 10,0 0))"),
             (1, "POLYGON ((10 0,20 0,20 10,10 10,10 0))")],
            "fid long, wkt string",
        )
        from gdal_spark.operators.spatial import area_udf

        rows = {
            r["fid"]: r["a"]
            for r in clean_coverage(df).withColumn("a", area_udf(F.col("wkt"))).collect()
        }
        assert rows == {0: 120.0, 1: 80.0}
