"""kNN operator tests: broadcast partial-top-k and grid-cell ring
expansion, both against numpy brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from gdal_spark.operators.cells import Grid
from gdal_spark.operators.knn import knn_broadcast, knn_cell_pruned


def _points(spark, n=300, seed=1):
    rng = np.random.default_rng(seed)
    xs = rng.uniform(0, 100, n)
    ys = rng.uniform(0, 100, n)
    df = spark.createDataFrame(
        [Row(id=i, x=float(xs[i]), y=float(ys[i])) for i in range(n)]
    )
    return df, xs, ys


def _brute(xs, ys, qx, qy, k):
    d2 = (xs - qx) ** 2 + (ys - qy) ** 2
    order = np.lexsort((np.arange(len(xs)), d2))
    return [(int(i), float(d2[i])) for i in order[:k]]


class TestKnnBroadcast:
    def test_matches_brute(self, spark):
        df, xs, ys = _points(spark)
        queries = [(0, 10.0, 10.0), (1, 55.5, 70.2), (2, 99.0, 1.0)]
        out = knn_broadcast(df, queries, k=7)
        got = {}
        for r in out.collect():
            got.setdefault(r.qid, []).append((r.nid, r.d2))
        for qid, qx, qy in queries:
            want = _brute(xs, ys, qx, qy, 7)
            assert sorted(got[qid], key=lambda t: (t[1], t[0])) == want

    def test_k_larger_than_n(self, spark):
        df, _, _ = _points(spark, n=5)
        out = knn_broadcast(df, [(0, 0.0, 0.0)], k=10).collect()
        assert len(out) == 5


class TestKnnCellPruned:
    def test_matches_brute_within_covered_radius(self, spark):
        df, xs, ys = _points(spark)
        queries = spark.createDataFrame(
            [Row(qid=0, x=20.0, y=20.0), Row(qid=1, x=80.0, y=30.0)]
        )
        grid = Grid(0, 0, 100, 100, nx=10, ny=10)
        out = knn_cell_pruned(df, queries, grid, k=5, max_rings=3)
        got = {}
        for r in out.collect():
            got.setdefault(r.qid, []).append((r.nid, r.d2))
        for qid, qx, qy in [(0, 20.0, 20.0), (1, 80.0, 30.0)]:
            want = _brute(xs, ys, qx, qy, 5)
            # with 300 points in 10x10 cells, 3 rings (30 units) always
            # cover the 5 nearest
            assert sorted(got[qid], key=lambda t: (t[1], t[0])) == pytest.approx(want)

    def test_kth_beyond_max_rings_falls_back_exact(self, spark):
        """Sparse corner: the k-th neighbor lies beyond max_rings, so
        the ring join cannot certify — the broadcast fallback must
        still return the exact brute-force answer (round-1 silently
        returned fewer than k rows here)."""
        rng = np.random.default_rng(3)
        # clustered points far from the query corner
        xs = rng.uniform(60, 100, 40)
        ys = rng.uniform(60, 100, 40)
        df = spark.createDataFrame(
            [Row(id=i, x=float(xs[i]), y=float(ys[i])) for i in range(40)]
        )
        queries = spark.createDataFrame([Row(qid=7, x=1.0, y=1.0)])
        grid = Grid(0, 0, 100, 100, nx=10, ny=10)
        out = knn_cell_pruned(df, queries, grid, k=5, max_rings=2)
        got = sorted(((r.nid, r.d2) for r in out.collect()), key=lambda t: (t[1], t[0]))
        want = _brute(xs, ys, 1.0, 1.0, 5)
        assert got == pytest.approx(want)

    def test_edge_query_no_cell_wrap(self, spark):
        """Query on the left grid edge: ring offsets must clamp, not
        wrap to the right edge (round-1 1D-cell arithmetic bug)."""
        df, xs, ys = _points(spark)
        queries = spark.createDataFrame([Row(qid=0, x=0.5, y=50.0)])
        grid = Grid(0, 0, 100, 100, nx=10, ny=10)
        out = knn_cell_pruned(df, queries, grid, k=4, max_rings=3)
        got = sorted(((r.nid, r.d2) for r in out.collect()), key=lambda t: (t[1], t[0]))
        assert got == pytest.approx(_brute(xs, ys, 0.5, 50.0, 4))
