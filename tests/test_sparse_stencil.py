"""Sparse tile tables through the stencil operators: the repo-wide
convention is that an in-bounds (band, ty, tx) key ABSENT from a tile
table acts init-valued. These tests drop tiles from the byte20 table
and assert each stencil operator (focal, fill, contour, seam-exact
point sampling) produces output bit-identical to running over the
dense-equivalent table where the dropped tiles carry init payloads —
i.e. absence is indistinguishable from materialized init. densify()
materializes that equivalence explicitly."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.raster import TILE_SCHEMA, densify


def _materialize(tiles, spec):
    arr = np.full((spec.height, spec.width), np.nan)
    for r in tiles.collect():
        t = np.frombuffer(r.payload, dtype=r.dtype).reshape(r.h, r.w)
        arr[r.ty * spec.tile_size : r.ty * spec.tile_size + r.h,
            r.tx * spec.tile_size : r.tx * spec.tile_size + r.w] = t
    return arr


def _dense_equiv_tiles(spark, drop, spec=BYTE20_SPEC):
    """byte20 tiles with `drop` keys replaced by explicit init payloads
    (the dense table the sparse one is defined to equal), and the
    dense-equivalent numpy array."""
    arr = BYTE20.astype(np.float64).copy()
    rows = []
    for ty in range(spec.ntiles_y):
        for tx in range(spec.ntiles_x):
            h, w = spec.tile_shape(ty, tx)
            oy, ox = ty * spec.tile_size, tx * spec.tile_size
            if (ty, tx) in drop:
                arr[oy : oy + h, ox : ox + w] = spec.init
                payload = np.full((h, w), spec.init, dtype=spec.dtype).tobytes()
            else:
                payload = bytes(BYTE20[oy : oy + h, ox : ox + w].tobytes())
            rows.append((1, ty, tx, h, w, spec.dtype, payload))
    df = spark.createDataFrame(
        rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary"
    )
    return df, arr


def sparse_tiles(spark, drop, spec=BYTE20_SPEC):
    from pyspark.sql import functions as F

    t = byte20_tiles(spark, spec)
    cond = None
    for ty, tx in drop:
        c = (F.col("ty") == ty) & (F.col("tx") == tx)
        cond = c if cond is None else (cond | c)
    return t.filter(~cond)


DROP = {(1, 0)}  # 4x16 edge-remainder tile: exercises shape synthesis too


class TestDensify:
    def test_densify_materializes_init_tiles(self, spark):
        spec = BYTE20_SPEC
        sparse = sparse_tiles(spark, DROP)
        dense = densify(sparse, spec)
        assert dense.count() == spec.nbands * spec.ntiles_y * spec.ntiles_x
        got = _materialize(dense, spec)
        _, want = _dense_equiv_tiles(spark, DROP)
        np.testing.assert_array_equal(got, want)
        # synthesized tile carries the spec dtype and true edge shape
        r = dense.filter("ty = 1 and tx = 0").collect()[0]
        assert (r.h, r.w) == spec.tile_shape(1, 0)
        assert r.dtype == spec.dtype

    def test_densify_of_dense_is_identity(self, spark):
        spec = BYTE20_SPEC
        t = byte20_tiles(spark, spec)
        assert densify(t, spec).count() == t.count()
        np.testing.assert_array_equal(
            _materialize(densify(t, spec), spec), _materialize(t, spec)
        )


class TestSparseStencil:
    def test_focal_slope_sparse_equals_dense_equivalent(self, spark):
        from gdal_spark.operators.focal import slope

        spec = BYTE20_SPEC
        got = _materialize(slope(sparse_tiles(spark, DROP), spec), spec)
        dense_df, _ = _dense_equiv_tiles(spark, DROP)
        want = _materialize(slope(dense_df, spec), spec)
        np.testing.assert_array_equal(got, want)
        assert not np.isnan(want).any()  # dropped tile's key was emitted

    def test_fill_nodata_sparse_equals_dense_equivalent(self, spark):
        from gdal_spark.operators.fill import fill_nodata

        spec = BYTE20_SPEC
        kw = dict(nodata=107.0, max_search_dist=10.0)
        got = _materialize(
            fill_nodata(sparse_tiles(spark, DROP), spec, **kw), spec
        )
        dense_df, _ = _dense_equiv_tiles(spark, DROP)
        want = _materialize(fill_nodata(dense_df, spec, **kw), spec)
        np.testing.assert_array_equal(got, want)
        assert not np.isnan(want).any()

    def test_contour_sparse_equals_dense_equivalent(self, spark):
        from gdal_spark.operators.contour import contour

        spec = BYTE20_SPEC
        got = {
            (r.level, r.wkt)
            for r in contour(sparse_tiles(spark, DROP), spec, interval=40.0).collect()
        }
        dense_df, _ = _dense_equiv_tiles(spark, DROP)
        want = {
            (r.level, r.wkt)
            for r in contour(dense_df, spec, interval=40.0).collect()
        }
        assert got == want and len(want) > 0

    def test_contour_polygons_sparse_equals_dense_equivalent(self, spark):
        from gdal_spark.operators.contour import contour_polygons

        spec = BYTE20_SPEC
        got = {
            (r.lvl_min, r.lvl_max, r.wkt)
            for r in contour_polygons(
                sparse_tiles(spark, DROP), spec, interval=60.0, dissolve=False
            ).collect()
        }
        dense_df, _ = _dense_equiv_tiles(spark, DROP)
        want = {
            (r.lvl_min, r.lvl_max, r.wkt)
            for r in contour_polygons(dense_df, spec, interval=60.0, dissolve=False).collect()
        }
        assert got == want and len(want) > 0

    def test_interp_points_seam_sparse_samples_init_canvas(self, spark):
        from gdal_spark.operators.grid import interpolate_at_points

        spec = BYTE20_SPEC
        # one point mid-dropped-tile, one straddling the seam into the
        # live (0,0) tile, one in a live tile near the dropped one
        pts = spark.createDataFrame(
            [
                (1, 440720.0 + 60 * 8.0, 3751320.0 - 60 * 18.0),  # inside (1,0)
                (2, 440720.0 + 60 * 8.0, 3751320.0 - 60 * 16.01),  # seam straddle
                (3, 440720.0 + 60 * 8.0, 3751320.0 - 60 * 15.3),  # live (0,0)
            ],
            "pid long, x double, y double",
        )
        kw = dict(method="bilinear", exact_seams=True)
        got = {
            r.pid: r.value
            for r in interpolate_at_points(
                sparse_tiles(spark, DROP), spec, pts, **kw
            ).collect()
        }
        dense_df, _ = _dense_equiv_tiles(spark, DROP)
        want = {
            r.pid: r.value
            for r in interpolate_at_points(dense_df, spec, pts, **kw).collect()
        }
        assert set(got) == {1, 2, 3}
        for pid in want:
            assert got[pid] == want[pid]

    def test_fully_isolated_absent_tile_needs_densify(self, spark):
        """A key whose entire 1-ring is also absent never forms a
        groupBy key — documented behavior; densify() first makes it
        appear. Use a 3x3 grid (12x12 @ ts=4... byte20 is 20x20 so
        ts=4 gives 5x5 tiles) and drop a tile plus its full ring."""
        from pyspark.sql import functions as F

        from gdal_spark.operators.focal import slope
        from gdal_spark.operators.raster import RasterSpec

        spec = RasterSpec(
            width=20, height=20, gt=BYTE20_SPEC.gt, dtype="uint8",
            nbands=1, tile_size=4,
        )
        drop = {(ty, tx) for ty in (1, 2, 3) for tx in (1, 2, 3)}
        t = sparse_tiles(spark, drop, spec)
        out = slope(t, spec)
        keys = {(r.ty, r.tx) for r in out.select("ty", "tx").collect()}
        assert (2, 2) not in keys  # isolated: never keyed
        assert (1, 1) in keys  # ring member with live neighbors: emitted
        # densify first -> full lattice, and equal to dense-equivalent
        out2 = slope(densify(t, spec), spec)
        dense_df, _ = _dense_equiv_tiles(spark, drop, spec)
        np.testing.assert_array_equal(
            _materialize(out2, spec), _materialize(slope(dense_df, spec), spec)
        )
