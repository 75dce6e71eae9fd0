"""FillNodata tests: scalar semantics of the quadrant search + the
distributed halo version vs the whole-array kernel (the
autotest/alg/fillnodata strategy: small rasters, exact expectations).
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.fill import fill_nodata, fill_nodata_array
from gdal_spark.operators.raster import RasterSpec


class TestArrayKernel:
    def test_single_hole_idw(self):
        """One nodata pixel surrounded by values: quadrants TL/BL/TR/BR
        pick (x-0? ...) — verify against a hand-computed blend."""
        d = np.array(
            [
                [1.0, 2.0, 3.0],
                [4.0, 0.0, 6.0],
                [7.0, 8.0, 9.0],
            ]
        )
        m = d != 0.0
        out, valid = fill_nodata_array(d, m, max_search_dist=2)
        # TL: (1,0)=2 dist 1 (own column, above); BL: (1,2)=8 dist 1
        # (own column, below); TR: nearest right-col candidate (2,1)=6
        # dist 1; BR: (2,1)... bottom-up at x+1 row1 -> y=1? (2,1) is
        # valid -> bu at column 2 row 1 = row 1 value 6 dist 1;
        # reference: TR=top-down col2 -> (2,1) val 6 d1; BR=bottom-up
        # col2 -> same cell val 6 d1.
        assert valid.all()
        expect = (2 + 8 + 6 + 6) / 4.0
        assert out[1, 1] == pytest.approx(expect)

    def test_nearest_mode(self):
        d = np.array([[5.0, 0.0, 0.0, 9.0]])
        m = d != 0.0
        out, valid = fill_nodata_array(d, m, max_search_dist=3, nearest=True)
        assert out[0, 1] == 5.0  # dist 1 left vs 2 right
        assert out[0, 2] == 9.0
        assert valid.all()

    def test_max_search_dist_respected(self):
        d = np.zeros((1, 10))
        d[0, 0] = 7.0
        m = np.zeros((1, 10), dtype=bool)
        m[0, 0] = True
        out, valid = fill_nodata_array(d, m, max_search_dist=3)
        assert valid[0, 3] and out[0, 3] == pytest.approx(7.0)
        assert not valid[0, 4]  # beyond search distance stays invalid

    def test_vertical_fill(self):
        d = np.zeros((5, 1))
        d[0, 0] = 10.0
        d[4, 0] = 20.0
        m = d != 0.0
        out, _ = fill_nodata_array(d, m, max_search_dist=4)
        # row 2: TL dist 2 val 10, BL dist 2 val 20 -> 15
        assert out[2, 0] == pytest.approx(15.0)

    def test_smoothing_only_touches_filled(self):
        d = np.array([[1.0, 0.0, 3.0], [1.0, 1.0, 3.0]])
        m = d != 0.0
        out, _ = fill_nodata_array(d, m, max_search_dist=2, smoothing_iterations=1)
        # valid pixels unchanged
        assert out[1, 0] == 1.0 and out[0, 0] == 1.0 and out[0, 2] == 3.0


class TestDistributed:
    def test_matches_whole_array(self, spark):
        """Striped byte20 through the tile/halo path == the whole-array
        kernel, bit for bit."""
        NOD = 999.0
        data = BYTE20.astype(np.float64).copy()
        mask = np.zeros_like(data, dtype=bool)
        mask[::5, :] = True
        data[~mask] = NOD
        expect, evalid = fill_nodata_array(data, mask, max_search_dist=6)

        import pandas as pd
        from pyspark.sql import functions as F

        from gdal_spark.operators.raster import TILE_SCHEMA

        def _stripe(batches):
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    t = np.frombuffer(r.payload, dtype=r.dtype).reshape(r.h, r.w).astype(np.float64)
                    oy = r.ty * BYTE20_SPEC.tile_size
                    for i in range(r.h):
                        if (oy + i) % 5 != 0:
                            t[i, :] = NOD
                    rows.append(
                        {"band": 1, "ty": r.ty, "tx": r.tx, "h": r.h, "w": r.w,
                         "dtype": "float64", "payload": t.tobytes()}
                    )
                yield pd.DataFrame(rows, columns=["band", "ty", "tx", "h", "w", "dtype", "payload"])

        masked = byte20_tiles(spark).mapInPandas(_stripe, TILE_SCHEMA)
        out = fill_nodata(masked, BYTE20_SPEC, nodata=NOD, max_search_dist=6.0)
        got = np.full((20, 20), np.nan)
        for r in out.collect():
            t = np.frombuffer(r["payload"], dtype=r["dtype"]).reshape(r["h"], r["w"])
            oy, ox = r["ty"] * BYTE20_SPEC.tile_size, r["tx"] * BYTE20_SPEC.tile_size
            got[oy : oy + r["h"], ox : ox + r["w"]] = t
        # 1e-14-level fp noise allowed: the padded tile frame clamps the
        # column steps at different absolute coordinates, which can
        # reassociate the IDW blend
        np.testing.assert_allclose(got, expect, rtol=1e-12)

    def test_halo_too_small_raises(self, spark):
        with pytest.raises(ValueError):
            fill_nodata(byte20_tiles(spark), BYTE20_SPEC, nodata=0, max_search_dist=99)


class TestNanNodata:
    def test_nan_nodata_fills(self, spark):
        """nodata=NaN must fill (NaN != NaN would otherwise mark
        everything valid; round-2 review finding)."""
        import pandas as pd

        from gdal_spark.operators.raster import TILE_SCHEMA

        spec = RasterSpec(width=8, height=8, gt=(0, 1, 0, 8, 0, -1), dtype="float64", tile_size=8)
        a = np.full((8, 8), np.nan)
        a[0, :] = 7.0
        df = spark.createDataFrame(
            pd.DataFrame([{"band": 1, "ty": 0, "tx": 0, "h": 8, "w": 8,
                           "dtype": "float64", "payload": a.tobytes()}])
        )
        out = fill_nodata(df, spec, nodata=float("nan"), max_search_dist=8.0).collect()[0]
        t = np.frombuffer(out["payload"], dtype=out["dtype"]).reshape(8, 8)
        assert np.isfinite(t).all()
        np.testing.assert_allclose(t[1:, :], 7.0)
