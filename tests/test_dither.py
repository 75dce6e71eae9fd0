"""Median-cut + dither tests (alg/gdalmediancut.cpp,
alg/gdaldither.cpp semantics)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC
from gdal_spark.operators.dither import (
    compute_median_cut_pct,
    dither_rgb_to_pct,
    dither_tiles,
    median_cut_boxes,
    nearest_color_indices,
    pct_map_tiles,
)
from gdal_spark.operators.raster import RasterSpec


def _rgb_tiles(spark, r, g, b, spec):
    rows = []
    ts = spec.tile_size
    for band, a in ((1, r), (2, g), (3, b)):
        for ty in range(spec.ntiles_y):
            for tx in range(spec.ntiles_x):
                t = a[ty * ts : (ty + 1) * ts, tx * ts : (tx + 1) * ts]
                rows.append(
                    {"band": band, "ty": ty, "tx": tx, "h": t.shape[0], "w": t.shape[1],
                     "dtype": "uint8", "payload": t.astype(np.uint8).tobytes()}
                )
    return spark.createDataFrame(pd.DataFrame(rows))


R20 = BYTE20.astype(np.uint8)
G20 = (255 - BYTE20).astype(np.uint8)
B20 = ((BYTE20.astype(np.int64) * 3) % 256).astype(np.uint8)


class TestMedianCut:
    def test_palette_size_and_improvement(self, spark):
        tiles = _rgb_tiles(spark, R20, G20, B20, BYTE20_SPEC)
        pal4 = compute_median_cut_pct(tiles, 4)
        pal16 = compute_median_cut_pct(tiles, 16)
        assert 1 <= len(pal4) <= 4 and 4 < len(pal16) <= 16
        assert all(0 <= c <= 255 for p in pal16 for c in p)

        def mean_err(pal):
            idx = nearest_color_indices(R20, G20, B20, pal)
            pa = np.asarray(pal)
            return float(
                np.abs(R20.astype(int) - pa[idx, 0]).mean()
                + np.abs(G20.astype(int) - pa[idx, 1]).mean()
                + np.abs(B20.astype(int) - pa[idx, 2]).mean()
            )

        assert mean_err(pal16) <= mean_err(pal4)

    def test_exact_colors_early_path(self, spark):
        """bits=8 with <= nColors distinct colors: the palette IS the
        distinct color set (gdalmediancut.cpp:547-554; order is sorted
        here — documented deviation from scan order)."""
        r = np.repeat(np.array([[10, 20, 30, 40]], dtype=np.uint8), 4, axis=0)
        g = np.full((4, 4), 7, dtype=np.uint8)
        b = np.tile(np.array([[1], [2], [1], [2]], dtype=np.uint8), (1, 4))
        spec = RasterSpec(width=4, height=4, gt=(0, 1, 0, 4, 0, -1), dtype="uint8", tile_size=4)
        tiles = _rgb_tiles(spark, r, g, b, spec)
        pal = compute_median_cut_pct(tiles, 16, bits=8)
        want = sorted({(int(rr), int(gg), int(bb)) for rr, gg, bb in zip(r.ravel(), g.ravel(), b.ravel())})
        assert pal == want

    def test_median_split_population_balance(self):
        """A two-cluster histogram splits between the clusters."""
        hist = np.zeros((32, 32, 32), dtype=np.int64)
        hist[2, 5, 5] = 100
        hist[28, 5, 5] = 100
        boxes = median_cut_boxes(hist, 2)
        assert len(boxes) == 2
        totals = sorted(b.total for b in boxes)
        assert totals == [100, 100]
        spans = sorted((b.rmin, b.rmax) for b in boxes)
        assert spans == [(2, 2), (28, 28)]  # shrunk to occupied cells


class TestDither:
    def test_exact_palette_zero_error(self):
        """When every pixel's color is in the palette, dithering equals
        plain nearest mapping (all errors zero)."""
        pal = [(10, 7, 1), (20, 7, 2), (30, 7, 1), (40, 7, 2)]
        r = np.repeat(np.array([[10, 20, 30, 40]], dtype=np.uint8), 4, axis=0)
        g = np.full((4, 4), 7, dtype=np.uint8)
        b = np.tile(np.array([[1], [2], [1], [2]], dtype=np.uint8), (1, 4))
        # force palette rows to match pixel rows exactly
        pal = [(10, 7, 1), (20, 7, 2), (10, 7, 2), (20, 7, 1), (30, 7, 1), (30, 7, 2), (40, 7, 1), (40, 7, 2)]
        got = dither_rgb_to_pct(r, g, b, pal)
        want = nearest_color_indices(r, g, b, pal)
        np.testing.assert_array_equal(got, want)

    def test_two_color_dither_preserves_mean(self):
        """Gray 128 dithered with {0, 255}: the error diffusion makes
        the average of the output track the input level."""
        v = np.full((32, 32), 128, dtype=np.uint8)
        pal = [(0, 0, 0), (255, 255, 255)]
        idx = dither_rgb_to_pct(v, v, v, pal)
        vals = np.asarray(pal)[idx, 0]
        assert abs(vals.mean() - 128) < 10
        assert set(np.unique(idx)) == {0, 1}  # actually dithers

    def test_l1_tie_first_index_wins(self):
        pal = [(100, 0, 0), (104, 0, 0)]
        idx = nearest_color_indices(
            np.array([[102]], dtype=np.uint8), np.zeros((1, 1), dtype=np.uint8), np.zeros((1, 1), dtype=np.uint8), pal
        )
        assert idx[0, 0] == 0

    def test_pct_map_tiles_matches_local(self, spark):
        tiles = _rgb_tiles(spark, R20, G20, B20, BYTE20_SPEC)
        pal = compute_median_cut_pct(tiles, 8)
        out = pct_map_tiles(tiles, pal).collect()
        got = np.zeros((20, 20), dtype=np.uint8)
        ts = BYTE20_SPEC.tile_size
        for r in out:
            t = np.frombuffer(r.payload, dtype="uint8").reshape(r.h, r.w)
            got[r.ty * ts : r.ty * ts + r.h, r.tx * ts : r.tx * ts + r.w] = t
        np.testing.assert_array_equal(got, nearest_color_indices(R20, G20, B20, pal))

    def test_dither_tiles_matches_kernel(self, spark):
        tiles = _rgb_tiles(spark, R20, G20, B20, BYTE20_SPEC)
        pal = compute_median_cut_pct(tiles, 8)
        out = dither_tiles(tiles, BYTE20_SPEC, pal).collect()
        got = np.zeros((20, 20), dtype=np.uint8)
        ts = BYTE20_SPEC.tile_size
        for r in out:
            t = np.frombuffer(r.payload, dtype="uint8").reshape(r.h, r.w)
            got[r.ty * ts : r.ty * ts + r.h, r.tx * ts : r.tx * ts + r.w] = t
        np.testing.assert_array_equal(got, dither_rgb_to_pct(R20, G20, B20, pal))
