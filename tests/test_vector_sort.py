"""`gdal vector sort` (apps/gdalalg_vector_sort.cpp): Hilbert feature
ordering must replay GDALHilbertCode (alg/hilbert.cpp) bit-exactly over
the layer extent with empties last; STR-tree ordering must match the
scalar STR bulk-load replica on both the guarded and the fully
distributed path."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.geom.hilbert import hilbert_code_xy
from gdal_spark.operators.vector_sort import (
    EMPTY_CODE,
    HILBERT_MAX,
    dense_seq,
    hilbert_sort,
    strtree_order_local,
    strtree_sort,
)


def _env_df(spark, minx, miny, maxx, maxy, extra_empty=0):
    n = len(minx)
    rows = [
        (int(i), float(minx[i]), float(miny[i]), float(maxx[i]), float(maxy[i]))
        for i in range(n)
    ]
    rows += [(n + k, None, None, None, None) for k in range(extra_empty)]
    return spark.createDataFrame(
        rows, "fid long, env_minx double, env_miny double, env_maxx double, env_maxy double"
    )


def _rand_envs(n, seed=42):
    rng = np.random.default_rng(seed)
    minx = rng.uniform(0, 1000, n)
    miny = rng.uniform(0, 1000, n)
    return minx, miny, minx + rng.uniform(0, 5, n), miny + rng.uniform(0, 5, n)


class TestDenseSeq:
    def test_dense_rank_matches_lexsort(self, spark):
        rng = np.random.default_rng(7)
        keys = rng.integers(0, 50, 300)  # heavy ties -> tiebreak path
        df = spark.createDataFrame(
            [(int(i), int(k)) for i, k in enumerate(keys)], "fid long, k long"
        )
        got = {r.fid: r.seq for r in dense_seq(df, "k", "fid", nbuckets=8).collect()}
        want = np.lexsort((np.arange(300), keys))
        assert got == {int(f): int(s) for s, f in enumerate(want)}

    def test_single_value_and_empty(self, spark):
        df = spark.createDataFrame([(1, 5), (2, 5), (3, 5)], "fid long, k long")
        got = {r.fid: r.seq for r in dense_seq(df, "k", "fid").collect()}
        assert got == {1: 0, 2: 1, 3: 2}
        e = spark.createDataFrame([], "fid long, k long")
        assert dense_seq(e, "k", "fid").count() == 0


class TestHilbertSort:
    def test_codes_bitexact_vs_reference_chain(self, spark):
        minx, miny, maxx, maxy = _rand_envs(400)
        df = _env_df(spark, minx, miny, maxx, maxy)
        got = {r.fid: r.hcode for r in hilbert_sort(df).collect()}
        x0, y0 = minx.min(), miny.min()
        W, H = maxx.max() - x0, maxy.max() - y0
        # std::round = half away from zero (np.round is half-to-even)
        xq = np.floor(HILBERT_MAX * ((minx + maxx) / 2 - x0) / W + 0.5).astype(np.uint32)
        yq = np.floor(HILBERT_MAX * ((miny + maxy) / 2 - y0) / H + 0.5).astype(np.uint32)
        want = hilbert_code_xy(xq, yq)
        assert all(got[i] == int(want[i]) for i in range(400))

    def test_seq_order_and_empties_last(self, spark):
        minx, miny, maxx, maxy = _rand_envs(200, seed=3)
        df = _env_df(spark, minx, miny, maxx, maxy, extra_empty=3)
        rows = sorted(hilbert_sort(df).collect(), key=lambda r: r.seq)
        assert [r.seq for r in rows] == list(range(203))
        assert [r.fid for r in rows[-3:]] == [200, 201, 202]  # id-tiebreak
        assert all(r.hcode == EMPTY_CODE for r in rows[-3:])
        codes = [r.hcode for r in rows[:-3]]
        assert codes == sorted(codes)

    def test_degenerate_extent_axis(self, spark):
        # all features on one vertical line: width==0 -> x=0 for all
        # (hilbert.cpp:83-90 guards division by zero per axis)
        df = _env_df(
            spark,
            np.full(5, 7.0), np.arange(5.0), np.full(5, 7.0), np.arange(5.0) + 1,
        )
        got = {r.fid: r.hcode for r in hilbert_sort(df).collect()}
        ys = np.round(HILBERT_MAX * (np.arange(5.0) + 0.5) / 5.0).astype(np.uint32)
        want = hilbert_code_xy(np.zeros(5, np.uint32), ys)
        assert all(got[i] == int(want[i]) for i in range(5))

    def test_all_empty_layer(self, spark):
        df = _env_df(spark, np.zeros(0), np.zeros(0), np.zeros(0), np.zeros(0), extra_empty=4)
        rows = sorted(hilbert_sort(df).collect(), key=lambda r: r.seq)
        assert [r.fid for r in rows] == [0, 1, 2, 3]
        assert all(r.hcode == EMPTY_CODE for r in rows)


class TestSTRtreeLocal:
    def test_single_leaf_is_y_then_tie_order(self):
        # n <= capacity: one slice, one leaf -> pure (cy, id) order
        miny = np.array([5.0, 1.0, 3.0, 1.0])
        minx = np.array([0.0, 10.0, 20.0, 30.0])
        rank = strtree_order_local(minx, miny, minx + 1, miny + 1, cap=10)
        # cy order: fid1 (1) fid3 (1, x-tiebreak by x-sorted position) fid2 (3) fid0 (5)
        assert list(rank) == [3, 0, 2, 1]

    def test_slicing_handcheck(self):
        # 4 points, cap=2: ceil(4/2)=2 -> sliceCount=2, sliceCapacity=2
        # x-sorted [A B | C D]; each slice y-sorted, leaves of 2;
        # level 2: 2 leaf nodes -> y-order of node centers
        minx = np.array([0.0, 1.0, 10.0, 11.0])
        miny = np.array([9.0, 0.0, 1.0, 8.0])
        rank = strtree_order_local(minx, miny, minx + 1, miny + 1, cap=2)
        # slice 1 = {0,1} y-order (1,0) -> leaf L0 env y [0,10] center 5
        # slice 2 = {2,3} y-order (2,3) -> leaf L1 env y [1,9] center 5
        # level2 tie on center y -> pack order (L0, L1)
        assert list(rank) == [1, 0, 2, 3]

    def test_dense_permutation(self):
        minx, miny, maxx, maxy = _rand_envs(137, seed=11)
        rank = strtree_order_local(minx, miny, maxx, maxy)
        assert sorted(rank) == list(range(137))


class TestSTRtreeSort:
    def test_guarded_path_matches_local(self, spark):
        minx, miny, maxx, maxy = _rand_envs(300, seed=5)
        df = _env_df(spark, minx, miny, maxx, maxy, extra_empty=2)
        got = {r.fid: r.seq for r in strtree_sort(df).collect()}
        want = strtree_order_local(minx, miny, maxx, maxy)
        assert all(got[i] == int(want[i]) for i in range(300))
        assert (got[300], got[301]) == (300, 301)  # empties appended

    def test_distributed_path_matches_local(self, spark):
        minx, miny, maxx, maxy = _rand_envs(500, seed=9)
        df = _env_df(spark, minx, miny, maxx, maxy)
        got = {
            r.fid: r.seq for r in strtree_sort(df, driver_guard=1).collect()
        }
        want = strtree_order_local(minx, miny, maxx, maxy)
        assert all(got[i] == int(want[i]) for i in range(500))

    def test_locality_beats_random(self, spark):
        # sorted-order neighbor distance far below shuffled order: the
        # point of the verb (gdalalg_vector_sort.cpp sorts for locality)
        minx, miny, maxx, maxy = _rand_envs(400, seed=13)
        rank = strtree_order_local(minx, miny, maxx, maxy)
        cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
        order = np.argsort(rank)
        d_sorted = np.hypot(np.diff(cx[order]), np.diff(cy[order])).mean()
        d_input = np.hypot(np.diff(cx), np.diff(cy)).mean()
        assert d_sorted < 0.35 * d_input
