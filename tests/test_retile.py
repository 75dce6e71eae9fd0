"""gdal_retile (osgeo_utils/gdal_retile.py) — pixel-identical
re-gridding of tile tables, both directions, with sparse inputs."""

from __future__ import annotations

import numpy as np

from gdal_spark.fixtures import BYTE20, BYTE20_CHECKSUM, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.raster import checksum_df, materialize_full
from gdal_spark.operators.retile import retile, retile_spec


def test_retile_down_is_pixel_identical(spark):
    t7 = retile(byte20_tiles(spark), BYTE20_SPEC, 7)
    s7 = retile_spec(BYTE20_SPEC, 7)
    assert np.array_equal(materialize_full(t7, s7), BYTE20)
    assert checksum_df(t7, s7) == BYTE20_CHECKSUM
    # 20/7 -> 3x3 tile grid with ragged last row/col
    rows = t7.collect()
    assert len(rows) == 9
    shapes = {(r["ty"], r["tx"]): (r["h"], r["w"]) for r in rows}
    assert shapes[(2, 2)] == (6, 6)
    assert shapes[(0, 2)] == (7, 6)


def test_retile_up_merges_tiles(spark):
    t32 = retile(byte20_tiles(spark), BYTE20_SPEC, 32)
    s32 = retile_spec(BYTE20_SPEC, 32)
    rows = t32.collect()
    assert len(rows) == 1
    assert (rows[0]["h"], rows[0]["w"]) == (20, 20)
    assert np.array_equal(materialize_full(t32, s32), BYTE20)


def test_retile_sparse_fills_init(spark):
    # drop tile (0, 1); its pixels must come back as spec.init (0)
    sparse = byte20_tiles(spark).filter("NOT (ty = 0 AND tx = 1)")
    t10 = retile(sparse, BYTE20_SPEC, 10)
    s10 = retile_spec(BYTE20_SPEC, 10)
    dense = BYTE20.copy()
    dense[0:16, 16:20] = 0
    got = materialize_full(t10, s10)
    assert np.array_equal(got, dense)
    # target tiles fully inside the dropped region are absent, not zero-filled
    keys = {(r["ty"], r["tx"]) for r in t10.select("ty", "tx").collect()}
    assert keys == {(0, 0), (0, 1), (1, 0), (1, 1)}


class TestOverviewModeRMS:
    def test_mode_first_to_reach_max(self):
        import numpy as np

        from gdal_spark.operators.tiles import _overview_mode_2x2

        def scalar(block):
            counts = {}
            best, bestc = None, 0
            for v in block:  # row-major a, b, c, d
                counts[v] = counts.get(v, 0) + 1
                if counts[v] > bestc:
                    best, bestc = v, counts[v]
            return best

        rng = np.random.default_rng(8)
        t = rng.integers(0, 4, (16, 16)).astype(np.uint8)
        got = _overview_mode_2x2(t)
        for py in range(8):
            for px in range(8):
                block = [t[2 * py, 2 * px], t[2 * py, 2 * px + 1],
                         t[2 * py + 1, 2 * px], t[2 * py + 1, 2 * px + 1]]
                assert got[py, px] == scalar(block), (py, px, block)

    def test_rms_byte_reference_formula(self):
        import numpy as np

        from gdal_spark.operators.tiles import _overview_rms_2x2

        rng = np.random.default_rng(9)
        t = rng.integers(0, 256, (20, 20)).astype(np.uint8)
        got = _overview_rms_2x2(t)
        for py in range(10):
            for px in range(10):
                vals = [int(t[2 * py, 2 * px]), int(t[2 * py, 2 * px + 1]),
                        int(t[2 * py + 1, 2 * px]), int(t[2 * py + 1, 2 * px + 1])]
                ss = sum(v * v for v in vals)
                s1 = (ss + 1) // 4
                r = int(np.sqrt(np.float32(s1)))
                if r * (r + 1) < s1:
                    r += 1
                assert got[py, px] == r

    def test_rms_float(self):
        import numpy as np

        from gdal_spark.operators.tiles import _overview_rms_2x2

        t = np.array([[3.0, 4.0], [0.0, 0.0]])
        got = _overview_rms_2x2(t)
        assert got[0, 0] == np.sqrt(25.0 / 4.0)


class TestOverviewGauss:
    def test_gauss_matches_reference_loops(self, spark):
        import numpy as np
        import pandas as pd
        from pyspark.sql import functions as F

        from gdal_spark.operators.raster import copy_word
        from gdal_spark.operators.tiles import overview_gauss

        rng = np.random.default_rng(12)
        ts = 8
        # 4x4 children of 8px -> src 32x32, parents form a 2x2 grid so
        # interior parents exercise the halo exchange
        H = W = 32
        src = rng.integers(0, 256, (H, W)).astype(np.uint8)

        def scalar():
            oh, ow = H // 2, W // 2
            out = np.zeros((oh, ow))
            k = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=float)
            for i in range(oh):
                for j in range(ow):
                    tot = cnt = 0.0
                    for dy in range(3):
                        for dx in range(3):
                            y, x = 2 * i + dy, 2 * j + dx
                            if y < H and x < W:
                                tot += float(src[y, x]) * k[dy, dx]
                                cnt += k[dy, dx]
                    out[i, j] = tot / cnt
            return copy_word(out, "uint8")

        rows = []
        for ty in range(4):
            for tx in range(4):
                rows.append((1, tx, ty, 1, "uint8",
                             src[ty * ts : ty * ts + ts, tx * ts : tx * ts + ts].tobytes()))
        tiles = spark.createDataFrame(
            rows, "z int, tx int, ty int, band int, dtype string, payload binary"
        )
        got = np.zeros((16, 16), dtype=np.uint8)
        for r in overview_gauss(tiles, tile_size=ts).collect():
            t = np.frombuffer(r.payload, dtype=np.uint8).reshape(ts, ts)
            got[r.ty * ts : r.ty * ts + ts, r.tx * ts : r.tx * ts + ts] = t
        np.testing.assert_array_equal(got, scalar())


class TestExpLevels:
    def test_reference_examples(self):
        from gdal_spark.operators.contour import exp_levels

        # byte20 range at base 1.5: 1.5^11, 1.5^12, 1.5^13
        got = exp_levels(74.0, 255.0, 1.5)
        assert got == [1.5 ** 11, 1.5 ** 12, 1.5 ** 13]
        # below 1.0 the first index pins to 1 (level 1.0)
        assert exp_levels(0.2, 5.0, 2.0) == [1.0, 2.0, 4.0]
        # bound exactly ON a level: fudge pushes past it (min) and
        # keeps it (max: 8 < 8+1e-6 -> recomputed index includes 8)
        assert exp_levels(8.0, 100.0, 2.0) == [16.0, 32.0, 64.0]
        assert exp_levels(1.0, 8.0, 2.0) == [2.0, 4.0, 8.0]
        # empty when min == max
        assert exp_levels(5.0, 5.0, 2.0) == []
