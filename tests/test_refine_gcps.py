"""-refine_gcps outlier elimination (alg/gdal_crs.cpp remove_outliers)."""

from __future__ import annotations

import numpy as np

from gdal_spark.geom.gcp import refine_gcps


def _affine_gcps(n=20, seed=4):
    rng = np.random.default_rng(seed)
    px = rng.uniform(0, 1000, n)
    ln = rng.uniform(0, 800, n)
    gx = 2.0 * px - 0.5 * ln + 50.0
    gy = 0.25 * px + 3.0 * ln - 7.0
    return px, ln, gx, gy


class TestRefineGCPs:
    def test_single_outlier_removed(self):
        px, ln, gx, gy = _affine_gcps()
        gx[3] += 5000.0
        gcps = list(zip(px, ln, gx, gy))
        keep, tr = refine_gcps(gcps, order=1, tolerance=1.0)
        assert 3 not in keep and len(keep) == len(gcps) - 1
        fx, fy = tr.forward(px[keep], ln[keep])
        np.testing.assert_allclose(fx, gx[keep], atol=1e-6)
        np.testing.assert_allclose(fy, gy[keep], atol=1e-6)

    def test_multiple_outliers_removed_worst_first(self):
        px, ln, gx, gy = _affine_gcps(n=30)
        for i, off in ((5, 9000.0), (11, 4000.0), (17, 2000.0)):
            gy[i] += off
        keep, _ = refine_gcps(list(zip(px, ln, gx, gy)), order=1, tolerance=1.0)
        assert {5, 11, 17}.isdisjoint(keep)
        assert len(keep) == 27

    def test_no_outliers_no_removal(self):
        px, ln, gx, gy = _affine_gcps()
        keep, _ = refine_gcps(list(zip(px, ln, gx, gy)), order=1, tolerance=1.0)
        assert keep == list(range(len(px)))

    def test_minimum_gcps_floor(self):
        # everything is an "outlier" vs a quadratic surface at tiny
        # tolerance -> removal stops at the minimum count
        px, ln, gx, gy = _affine_gcps(n=12)
        gx = gx + 0.01 * px * px  # model mismatch for order 1
        keep, _ = refine_gcps(list(zip(px, ln, gx, gy)), order=1,
                              tolerance=1e-12, minimum_gcps=6)
        assert len(keep) == 6

    def test_inverse_refit_uses_kept_points(self):
        px, ln, gx, gy = _affine_gcps()
        gx[0] += 3000.0
        keep, tr = refine_gcps(list(zip(px, ln, gx, gy)), order=1, tolerance=1.0)
        ix, iy = tr.inverse(gx[keep], gy[keep])
        np.testing.assert_allclose(ix, px[keep], atol=1e-6)
        np.testing.assert_allclose(iy, ln[keep], atol=1e-6)


class TestGdalMove:
    def test_affine_transform_zero_error(self):
        from gdal_spark.operators.gdalmove import move_geotransform

        import numpy as np

        def aff(xs, ys):
            x, y = np.asarray(xs), np.asarray(ys)
            return 2 * x - y + 5, x + 3 * y - 1

        gt = (10.0, 2.0, 0.5, 20.0, -0.25, -2.0)
        new_gt, report, updated = move_geotransform(16, 12, gt, aff)
        assert updated
        for r in report:
            assert abs(r.err_x) < 1e-8 and abs(r.err_y) < 1e-8
            assert abs(r.err_px) < 1e-9 and abs(r.err_py) < 1e-9

    def test_inv_geotransform_paths(self):
        from gdal_spark.operators.gdalmove import inv_geotransform

        # no-rotation special path
        inv = inv_geotransform((100.0, 2.0, 0.0, 50.0, 0.0, -4.0))
        assert inv == (-50.0, 0.5, 0.0, 12.5, 0.0, -0.25)
        # rotated general path round-trips
        gt = (5.0, 1.5, 0.3, -2.0, -0.2, -1.1)
        inv = inv_geotransform(gt)
        x, y = 7.25, -3.5
        gx = gt[0] + x * gt[1] + y * gt[2]
        gy = gt[3] + x * gt[4] + y * gt[5]
        rx = inv[0] + gx * inv[1] + gy * inv[2]
        ry = inv[3] + gx * inv[4] + gy * inv[5]
        assert abs(rx - x) < 1e-12 and abs(ry - y) < 1e-12
        # singular
        assert inv_geotransform((0.0, 1.0, 1.0, 0.0, 1.0, 1.0)) is None

    def test_pixel_threshold_gates_update(self):
        from gdal_spark.operators.gdalmove import move_geotransform

        import numpy as np

        def quad(xs, ys):
            x, y = np.asarray(xs, float), np.asarray(ys, float)
            return x + 0.05 * x * x, y

        _, _, updated = move_geotransform(100, 100, (0, 1, 0, 0, 0, -1), quad,
                                          pixel_threshold=0.1)
        assert not updated
        _, _, updated2 = move_geotransform(100, 100, (0, 1, 0, 0, 0, -1), quad,
                                           pixel_threshold=1e9)
        assert updated2
