"""GCP polynomial transformer tests mirroring
autotest/gcore/transformer.py::test_transformer_2 (data/gcps.vrt
fixture) plus exact-fit properties per order."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.geom.gcp import GCPPipeline, GCPTransformer

# autotest/gcore/data/gcps.vrt GCP list
GCPS_VRT = [
    (0.0, 0.0, 440720.0, 3751320.0),
    (100.0, 0.0, 446720.0, 3751320.0),
    (0.0, 100.0, 440720.0, 3745320.0),
    (100.0, 100.0, 446720.0, 3745320.0),
]


class TestGCPTransformer:
    def test_transformer_2_forward_reverse(self):
        """transformer.py:60-80: (20, 10) -> (441920, 3750720), and
        the reverse round-trips within 0.001."""
        tr = GCPTransformer(GCPS_VRT, order=1)
        x, y = tr.forward(np.array([20.0]), np.array([10.0]))
        assert x[0] == pytest.approx(441920, abs=0.001)
        assert y[0] == pytest.approx(3750720, abs=0.001)
        px, py = tr.inverse(x, y)
        assert px[0] == pytest.approx(20, abs=0.001)
        assert py[0] == pytest.approx(10, abs=0.001)

    def test_gcps_reproduced_exactly_each_order(self):
        """With >= the required GCP count drawn from an exact
        polynomial of that order, the fit reproduces every GCP."""
        rng = np.random.default_rng(5)
        for order in (1, 2, 3):
            n = {1: 5, 2: 8, 3: 12}[order]
            px = rng.uniform(0, 100, n)
            py = rng.uniform(0, 100, n)
            # target = an exact polynomial of the same order
            gx = 1000 + 2 * px - 3 * py
            gy = 500 - px + 4 * py
            if order >= 2:
                gx = gx + 0.01 * px * px - 0.02 * px * py
                gy = gy + 0.015 * py * py
            if order >= 3:
                gx = gx + 1e-4 * px * px * py
                gy = gy - 2e-4 * py * py * py
            tr = GCPTransformer(list(zip(px, py, gx, gy)), order=order)
            fx, fy = tr.forward(px, py)
            np.testing.assert_allclose(fx, gx, rtol=1e-9)
            np.testing.assert_allclose(fy, gy, rtol=1e-9)

    def test_overdetermined_least_squares(self):
        """Noisy GCPs: order-1 fit equals the analytic least-squares
        affine (normal-equation solution)."""
        rng = np.random.default_rng(9)
        px = rng.uniform(0, 50, 30)
        py = rng.uniform(0, 50, 30)
        gx = 10 + 3 * px + 0.5 * py + rng.normal(0, 0.1, 30)
        gy = -5 + 0.2 * px + 2 * py + rng.normal(0, 0.1, 30)
        tr = GCPTransformer(list(zip(px, py, gx, gy)), order=1)
        a = np.column_stack([np.ones(30), px - px.mean(), py - py.mean()])
        want_e = np.linalg.solve(a.T @ a, a.T @ gx)
        np.testing.assert_allclose(tr.E12, want_e, rtol=1e-9)

    def test_min_gcp_count_enforced(self):
        with pytest.raises(ValueError):
            GCPTransformer(GCPS_VRT[:2], order=1)
        with pytest.raises(ValueError):
            GCPTransformer(GCPS_VRT, order=2)  # 4 < 6
        with pytest.raises(ValueError):
            GCPTransformer(GCPS_VRT, order=4)

    def test_pipeline_composition_with_projection(self):
        """GCPPipeline chains pixel->geo->projected; inverse returns
        to pixel space (the warp-path contract)."""

        class Scale2:
            def forward(self, x, y):
                return x * 2.0, y * 2.0

            def inverse(self, x, y):
                return x / 2.0, y / 2.0

        p = GCPPipeline(GCPS_VRT, order=1, geo_pipeline=Scale2())
        X, Y = p.forward(np.array([20.0]), np.array([10.0]))
        assert X[0] == pytest.approx(2 * 441920, abs=0.01)
        px, py = p.inverse(X, Y)
        assert px[0] == pytest.approx(20, abs=1e-6) and py[0] == pytest.approx(10, abs=1e-6)

    def test_warp_with_gcps_through_raster_tile(self, spark):
        """A GCP-georeferenced source (identity geotransform) warps
        through raster_tile: the GCP grid equals byte20's affine
        georeferencing, so tile keys match the affine path."""
        from gdal_spark.fixtures import BYTE20_SPEC, byte20_tiles
        from gdal_spark.geom.proj import EPSG_26711, Pipeline
        from gdal_spark.operators.raster import RasterSpec
        from gdal_spark.operators.tiles import raster_tile

        # GCPs reproducing byte20's GT: origin (440720, 3751320), 60 m px
        gcps = [
            (0.0, 0.0, 440720.0, 3751320.0),
            (20.0, 0.0, 441920.0, 3751320.0),
            (0.0, 20.0, 440720.0, 3750120.0),
            (20.0, 20.0, 441920.0, 3750120.0),
        ]
        ident_spec = RasterSpec(
            width=20, height=20, gt=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
            dtype=BYTE20_SPEC.dtype, tile_size=BYTE20_SPEC.tile_size,
        )
        pipe = GCPPipeline(gcps, order=1, geo_pipeline=Pipeline(src=EPSG_26711, dst="webmercator"))
        tiles = raster_tile(byte20_tiles(spark), ident_spec, pipe, min_zoom=11, max_zoom=11, resampling="near")
        keys = {(r.z, r.tx, r.ty) for r in tiles.select("z", "tx", "ty").distinct().collect()}
        assert keys == {(11, 354, 818)}
