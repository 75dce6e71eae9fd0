"""Contour operator tests: analytic ramp, distributed-vs-local
equality across tile seams, interval level generation."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.contour import contour, marching_squares
from gdal_spark.operators.dissolve import merge_lines
from gdal_spark.operators.raster import RasterSpec


def _tiles_of(spark, arr, tile_size):
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


def _lines(rows):
    out = []
    for r in rows:
        body = r.wkt[len("LINESTRING (") : -1]
        out.append((r.level, np.array([[float(t) for t in p.split()] for p in body.split(",")])))
    return out


class TestMarchingSquares:
    def test_vertical_ramp_gives_straight_contour(self):
        # values increase left->right: contour at 5 is a vertical line
        arr = np.tile(np.arange(10, dtype=np.float64), (6, 1))
        segs = marching_squares(arr, 5.0)
        pts = np.array([p for s in segs for p in s])
        assert np.allclose(pts[:, 0], 5.5)  # x = node 5 center (=5.5 px)

    def test_level_outside_range_empty(self):
        arr = np.ones((4, 4))
        assert marching_squares(arr, 99.0) == []


class TestContourDistributed:
    def test_tiled_equals_whole_array(self, spark):
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 100, size=(24, 24)).astype(np.float64)
        tiles, spec = _tiles_of(spark, arr, tile_size=8)
        got = _lines(contour(tiles, spec, levels=[50.0]).collect())

        ref_segs = marching_squares(arr, 50.0)
        ref = merge_lines([np.array([s[0], s[1]]) for s in ref_segs])

        def canon(lines):
            out = set()
            for ln in lines:
                t = tuple(map(tuple, np.round(ln, 9)))
                if len(t) > 1 and t[0] == t[-1]:
                    # closed ring: rotation + direction invariant
                    body = t[:-1]
                    cands = []
                    for seq in (body, body[::-1]):
                        k = seq.index(min(seq))
                        cands.append(seq[k:] + seq[:k])
                    t = min(cands) + (min(min(cands)),)  # reclose marker
                    out.add(t)
                else:
                    out.add(min(t, t[::-1]))
            return out

        assert canon([ln for _, ln in got]) == canon(ref)

    def test_interval_levels(self, spark):
        tiles = byte20_tiles(spark)
        rows = contour(tiles, BYTE20_SPEC, interval=50.0).collect()
        levels = sorted({r.level for r in rows})
        # byte20 range is [74, 255] -> levels 100, 150, 200, 250
        assert levels == [100.0, 150.0, 200.0, 250.0]

    def test_ramp_world_positions(self, spark):
        arr = np.tile(np.arange(16, dtype=np.float64), (16, 1))
        tiles, spec = _tiles_of(spark, arr, tile_size=8)
        got = _lines(contour(tiles, spec, levels=[7.0]).collect())
        assert len(got) >= 1
        for _, ln in got:
            assert np.allclose(ln[:, 0], 7.5)


class TestContourPolygons:
    """Isoband polygonize mode (alg/contour.cpp polygonize flag)."""

    def test_bands_tile_the_grid(self, spark):
        from gdal_spark.fixtures import BYTE20_SPEC, byte20_tiles
        from gdal_spark.geom.wkt import parse_wkt
        from gdal_spark.operators.contour import contour_polygons

        out = contour_polygons(byte20_tiles(spark), BYTE20_SPEC, interval=50.0).collect()
        # one feature per band
        bands = [(r.lvl_min, r.lvl_max) for r in out]
        assert len(bands) == len(set(bands))
        total = sum(float(parse_wkt([r.wkt]).areas()[0]) for r in out)
        # node grid is 19x19 cells of unit (pixel) size
        # rel 1e-3: band boundaries have fractional vertices that the
        # union kernel snaps to its 1/64 grid
        assert total == pytest.approx(19 * 19, rel=1e-3)

    def test_flat_raster_single_band(self, spark):
        import pandas as pd

        from gdal_spark.operators.contour import contour_polygons
        from gdal_spark.operators.raster import RasterSpec
        from gdal_spark.geom.wkt import parse_wkt

        spec = RasterSpec(width=8, height=8, gt=(0, 1, 0, 8, 0, -1), dtype="float64", tile_size=8)
        arr = np.full((8, 8), 42.0)
        df = spark.createDataFrame(
            pd.DataFrame(
                [{"band": 1, "ty": 0, "tx": 0, "h": 8, "w": 8,
                  "dtype": "float64", "payload": arr.tobytes()}]
            )
        )
        out = contour_polygons(df, spec, interval=10.0).collect()
        assert len(out) == 1
        assert (out[0].lvl_min, out[0].lvl_max) == (40.0, 50.0)
        assert parse_wkt([out[0].wkt]).areas()[0] == pytest.approx(49.0)

    def test_band_edges_are_iso_lines(self, spark):
        """A linear ramp: band boundaries land exactly on the
        marching-squares crossing positions."""
        import pandas as pd

        from gdal_spark.operators.contour import contour_polygons
        from gdal_spark.geom.wkt import parse_wkt
        from gdal_spark.operators.raster import RasterSpec

        spec = RasterSpec(width=6, height=2, gt=(0, 1, 0, 2, 0, -1), dtype="float64", tile_size=8)
        arr = np.tile(np.arange(6, dtype=np.float64) * 10, (2, 1))  # 0..50 ramp
        df = spark.createDataFrame(
            pd.DataFrame(
                [{"band": 1, "ty": 0, "tx": 0, "h": 2, "w": 6,
                  "dtype": "float64", "payload": arr.tobytes()}]
            )
        )
        out = {(r.lvl_min): r.wkt for r in contour_polygons(df, spec, interval=25.0).collect()}
        # band [25, 50) starts at x where v=25 -> between nodes 2,3 at x=3.0
        env = parse_wkt([out[25.0]]).envelopes()[0]
        assert env[0] == pytest.approx(3.0)


def test_contour_polygons_nan_cells_skipped(spark):
    """NaN nodata pixels must not crash the isoband loop (round-2
    review finding); their cells are simply not banded."""
    import pandas as pd

    from gdal_spark.operators.contour import contour_polygons
    from gdal_spark.operators.raster import RasterSpec

    spec = RasterSpec(width=4, height=4, gt=(0, 1, 0, 4, 0, -1), dtype="float64", tile_size=4)
    a = np.full((4, 4), 42.0)
    a[1, 1] = np.nan
    df = spark.createDataFrame(
        pd.DataFrame([{"band": 1, "ty": 0, "tx": 0, "h": 4, "w": 4,
                       "dtype": "float64", "payload": a.tobytes()}])
    )
    out = contour_polygons(df, spec, interval=10.0).collect()
    assert len(out) == 1  # the finite cells still band
