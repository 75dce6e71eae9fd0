"""Sieve filter tests: the local replica is pinned to the reference
autotest checksums; the distributed version is checked against a
whole-array run with the same deterministic tie rule."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators.raster import RasterSpec, checksum_array
from gdal_spark.operators.sieve import sieve, sieve_local

# autotest/alg/data/sieve_src.grd (5x7)
SIEVE_SRC = np.array(
    [
        [107, 123, 132, 115, 132],
        [115, 132, 132, 123, 123],
        [115, 132, 140, 132, 123],
        [148, 132, 123, 123, 123],
        [156, 156, 156, 140, 132],
        [156, 100, 156, 101, 102],
        [156, 156, 156, 103, 103],
    ],
    dtype=np.uint8,
)


class TestSieveLocal:
    def test_reference_checksum_4conn(self):
        # autotest/alg/sieve.py test_sieve_1: threshold 2, 4-conn -> cs 364
        out = sieve_local(SIEVE_SRC, threshold=2, connect=4)
        assert checksum_array(out) == 364

    def test_reference_checksum_8conn(self):
        # test_sieve_2: threshold 2, 8-conn -> cs 370
        out = sieve_local(SIEVE_SRC, threshold=2, connect=8)
        assert checksum_array(out) == 370

    def test_threshold_1_identity(self):
        out = sieve_local(SIEVE_SRC, threshold=1, connect=4)
        np.testing.assert_array_equal(out, SIEVE_SRC)

    def test_big_threshold_merges_most(self):
        out = sieve_local(SIEVE_SRC, threshold=3, connect=4)
        # the isolated 1-px 100/101/102/103 specks must be gone
        for v in (100, 101, 102):
            assert not (out == v).any()


def _tiles(spark, arr, tile_size):
    spec = RasterSpec(
        width=arr.shape[1], height=arr.shape[0],
        gt=(0.0, 1.0, 0.0, float(arr.shape[0]), 0.0, -1.0),
        dtype=str(arr.dtype), tile_size=tile_size,
    )
    rows = []
    for ty in range(spec.ntiles_y):
        for tx in range(spec.ntiles_x):
            h, w = spec.tile_shape(ty, tx)
            oy, ox = ty * tile_size, tx * tile_size
            rows.append((1, ty, tx, h, w, str(arr.dtype), arr[oy : oy + h, ox : ox + w].tobytes()))
    return (
        spark.createDataFrame(rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary"),
        spec,
    )


def _mat(tiles, spec):
    arr = np.zeros((spec.height, spec.width), dtype=spec.dtype)
    for r in tiles.collect():
        t = np.frombuffer(r.payload, dtype=r.dtype).reshape(r.h, r.w)
        arr[r.ty * spec.tile_size : r.ty * spec.tile_size + r.h,
            r.tx * spec.tile_size : r.tx * spec.tile_size + r.w] = t
    return arr


class TestSieveDistributed:
    def test_matches_local_across_seams(self, spark):
        # construct a raster where sizes are all distinct (no ties),
        # so the distributed tie rule and GDAL's scan-order rule agree
        rng = np.random.default_rng(12)
        arr = np.full((16, 16), 9, dtype=np.uint8)
        arr[0:3, 0:5] = 1  # 15 px
        arr[7:9, 6:10] = 2  # 8 px, crosses tile seam at x=8
        arr[10, 10] = 3  # 1 px speck
        arr[15, 0] = 4  # 1 px corner speck
        tiles, spec = _tiles(spark, arr, tile_size=8)
        got = _mat(sieve(tiles, spec, threshold=4), spec)
        want = sieve_local(arr, threshold=4, connect=4)
        np.testing.assert_array_equal(got, want)
        assert not (got == 3).any() and not (got == 4).any()

    def test_8conn_diagonal_component(self, spark):
        arr = np.full((8, 8), 5, dtype=np.uint8)
        arr[3, 3] = 7
        arr[4, 4] = 7  # diagonal pair: one component under 8-conn
        tiles, spec = _tiles(spark, arr, tile_size=4)
        got4 = _mat(sieve(tiles, spec, threshold=2, connect=4), spec)
        got8 = _mat(sieve(tiles, spec, threshold=2, connect=8), spec)
        assert not (got4 == 7).any()  # 4-conn: two 1-px specks removed
        assert (got8 == 7).sum() == 2  # 8-conn: one 2-px comp >= threshold

    def test_nodata_excluded(self, spark):
        arr = np.full((8, 8), 5, dtype=np.uint8)
        arr[2, 2] = 0  # nodata
        arr[5, 5] = 7  # small speck
        tiles, spec = _tiles(spark, arr, tile_size=4)
        got = _mat(sieve(tiles, spec, threshold=2, nodata=0.0), spec)
        assert got[2, 2] == 0  # nodata preserved
        assert got[5, 5] == 5  # speck merged into surrounding
