"""Line-of-sight tests vs a scalar replica of GDALIsLineOfSightVisible
(alg/los.cpp): endpoint pre-checks, Bresenham path, distance-ratio z."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators.los import line_of_sight
from gdal_spark.operators.raster import RasterSpec, TILE_SCHEMA


def _bres(x1, y1, x2, y2):
    dx, incx = abs(x2 - x1), (1 if x2 >= x1 else -1)
    dy, incy = abs(y2 - y1), (1 if y2 >= y1 else -1)
    pts = []
    x, y = x1, y1
    if dx >= dy:
        DY, DX = dy * 2, dx * 2
        bal = DY - dx
        while x != x2:
            pts.append((x, y))
            if bal >= 0:
                y += incy
                bal -= DX
            bal += DY
            x += incx
        pts.append((x, y))
    else:
        DX, DY = dx * 2, dy * 2
        bal = DX - dy
        while y != y2:
            pts.append((x, y))
            if bal >= 0:
                x += incx
                bal -= DY
            bal += DX
            y += incy
        pts.append((x, y))
    return pts


def _ref_los(dem, a, b):
    """Scalar GDALIsLineOfSightVisible replica."""
    xa, ya, za = a
    xb, yb, zb = b
    if za < dem[ya, xa]:
        return False, xa, ya
    if zb < dem[yb, xb]:
        return False, xb, yb
    if (xa, ya) == (xb, yb):
        return True, -1, -1
    denom = (xb - xa) ** 2 + (yb - ya) ** 2
    for (x, y) in _bres(xa, ya, xb, yb):
        ratio = math.sqrt(((x - xa) ** 2 + (y - ya) ** 2) / denom)
        z = za + ratio * (zb - za)
        if z < dem[y, x]:
            return False, x, y
    return True, -1, -1


def _dem_tiles(spark, dem, spec):
    rows = []
    ts = spec.tile_size
    for ty in range(spec.ntiles_y):
        for tx in range(spec.ntiles_x):
            t = dem[ty * ts : (ty + 1) * ts, tx * ts : (tx + 1) * ts]
            rows.append(
                {"band": 1, "ty": ty, "tx": tx, "h": t.shape[0], "w": t.shape[1],
                 "dtype": "float64", "payload": t.astype(np.float64).tobytes()}
            )
    return spark.createDataFrame(pd.DataFrame(rows))


SPEC = RasterSpec(width=24, height=24, gt=(0, 1, 0, 24, 0, -1), dtype="float64", tile_size=8)


@pytest.fixture(scope="module")
def dem():
    rng = np.random.default_rng(17)
    d = rng.uniform(0, 10, size=(24, 24))
    d[10:14, 10:14] = 100.0  # a wall in the middle
    return d


class TestLineOfSight:
    def test_clear_path_over_wall(self, spark, dem):
        tiles = _dem_tiles(spark, dem, SPEC)
        r = line_of_sight(tiles, SPEC, (2, 2, 200.0), (20, 20, 200.0))
        assert r.visible is True and (r.ix, r.iy) == (-1, -1)

    def test_wall_blocks(self, spark, dem):
        tiles = _dem_tiles(spark, dem, SPEC)
        a, b = (2, 2, 20.0), (20, 20, 20.0)
        r = line_of_sight(tiles, SPEC, a, b)
        want = _ref_los(dem, a, b)
        assert (r.visible, r.ix, r.iy) == want
        assert r.visible is False

    def test_endpoint_below_terrain(self, spark, dem):
        tiles = _dem_tiles(spark, dem, SPEC)
        r = line_of_sight(tiles, SPEC, (12, 12, 5.0), (20, 20, 200.0))
        assert (r.visible, r.ix, r.iy) == (False, 12, 12)

    @pytest.mark.parametrize(
        "a,b",
        [
            ((0, 5, 30.0), (23, 5, 30.0)),  # horizontal
            ((7, 0, 30.0), (7, 23, 30.0)),  # vertical
            ((0, 0, 15.0), (23, 9, 40.0)),  # shallow diagonal
            ((3, 22, 40.0), (19, 1, 15.0)),  # steep reversed
        ],
    )
    def test_matches_scalar_replica(self, spark, dem, a, b):
        tiles = _dem_tiles(spark, dem, SPEC)
        r = line_of_sight(tiles, SPEC, a, b)
        want = _ref_los(dem, a, b)
        assert (r.visible, r.ix, r.iy) == want


class TestViewshed:
    def test_matches_per_cell_los(self, spark, dem):
        """Viewshed == per-cell exact LOS replica (the R3 definition)."""
        from gdal_spark.operators.viewshed import viewshed

        tiles = _dem_tiles(spark, dem, SPEC)
        obs = (2, 2)
        oz = dem[2, 2] + 2.0
        out = viewshed(tiles, SPEC, obs, observer_height=2.0).collect()
        got = np.zeros((24, 24), dtype=np.uint8)
        for r in out:
            t = np.frombuffer(r["payload"], dtype=r["dtype"]).reshape(r["h"], r["w"])
            got[r["ty"] * 8 : r["ty"] * 8 + r["h"], r["tx"] * 8 : r["tx"] * 8 + r["w"]] = t
        for y in range(24):
            for x in range(24):
                want, _, _ = _ref_los(dem, (2, 2, oz), (x, y, dem[y, x]))
                assert got[y, x] == (1 if want else 0), (x, y)

    def test_vectorized_kernel_exhaustive_parity(self):
        """The chunked numpy LOS kernel is bit-identical to the scalar
        Bresenham walk for EVERY cell, across octants, observer edge
        positions, and negative target heights (pure numpy, no Spark)."""
        from gdal_spark.operators.viewshed import _los_visible, visibility_of_targets

        rng = np.random.default_rng(41)
        d = rng.uniform(0, 12, size=(40, 40))
        d[15:18, 20:23] = 90.0
        d[30, 5] = 60.0
        jj, ii = np.meshgrid(np.arange(40), np.arange(40))
        gx, gy = jj.ravel(), ii.ravel()
        for (ox, oy), th in [((5, 7), 0.0), ((39, 0), 0.0), ((20, 20), -1.5), ((0, 39), 3.0)]:
            oz = d[oy, ox] + 2.0
            got = visibility_of_targets(d, ox, oy, oz, gx, gy, th)
            for k in range(len(gx)):
                want = _los_visible(d, ox, oy, oz, int(gx[k]), int(gy[k]), d[gy[k], gx[k]] + th)
                assert got[k] == (1 if want else 0), (ox, oy, int(gx[k]), int(gy[k]))

    def test_vectorized_kernel_observer_below_terrain(self):
        from gdal_spark.operators.viewshed import visibility_of_targets

        d = np.full((8, 8), 10.0)
        out = visibility_of_targets(d, 3, 3, 5.0, np.arange(8), np.zeros(8, dtype=int), 0.0)
        assert out.sum() == 0

    def test_wall_shadows(self, spark, dem):
        from gdal_spark.operators.viewshed import viewshed

        tiles = _dem_tiles(spark, dem, SPEC)
        out = viewshed(tiles, SPEC, (2, 2), observer_height=2.0).collect()
        got = np.zeros((24, 24), dtype=np.uint8)
        for r in out:
            t = np.frombuffer(r["payload"], dtype=r["dtype"]).reshape(r["h"], r["w"])
            got[r["ty"] * 8 : r["ty"] * 8 + r["h"], r["tx"] * 8 : r["tx"] * 8 + r["w"]] = t
        assert got[2, 2] == 1  # observer sees its own cell
        # the 100-unit wall at [10:14,10:14] casts a shadow beyond it
        assert got[10:14, 10:14].sum() >= 1  # wall tops visible
        assert got[20:, 20:].sum() == 0  # far corner behind the wall hidden


class TestCumulativeViewshed:
    def test_equals_sum_of_single_observer_masks(self, spark, dem):
        """cumulative.cpp semantics: per-cell count of observers that
        see it == the sum of the individual viewshed masks."""
        from gdal_spark.operators.viewshed import cumulative_viewshed, viewshed

        tiles = _dem_tiles(spark, dem, SPEC)
        spacing = 12  # observers at x,y in {0, 12} -> 4 observers

        def collect_mat(rows, dt):
            m = np.zeros((24, 24), dtype=dt)
            for r in rows:
                t = np.frombuffer(r["payload"], dtype=r["dtype"]).reshape(r["h"], r["w"])
                m[r["ty"] * 8 : r["ty"] * 8 + r["h"], r["tx"] * 8 : r["tx"] * 8 + r["w"]] = t
            return m

        got = collect_mat(
            cumulative_viewshed(tiles, SPEC, spacing, observer_height=2.0).collect(), np.int32
        )
        want = np.zeros((24, 24), dtype=np.int32)
        for oy in (0, 12):
            for ox in (0, 12):
                want += collect_mat(
                    viewshed(tiles, SPEC, (ox, oy), observer_height=2.0).collect(), np.uint8
                ).astype(np.int32)
        np.testing.assert_array_equal(got, want)
