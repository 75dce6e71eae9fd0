"""Homography transformer parity with alg/gdal_homography.cpp."""

import numpy as np
import pytest

from gdal_spark.geom.homography import (
    HomographyTransformer,
    apply_homography,
    compose_homographies,
    gcps_to_homography,
    inv_homography,
)


def _as_matrix(h):
    # apply(): X row = [h1, h2, h0], Y row = [h4, h5, h3], w row = [h7, h8, h6]
    return np.array([[h[1], h[2], h[0]], [h[4], h[5], h[3]], [h[7], h[8], h[6]]])


def test_compose_matches_matrix_product():
    rng = np.random.default_rng(7)
    h1 = rng.uniform(-2, 2, 9)
    h2 = rng.uniform(-2, 2, 9)
    h1[6], h2[6] = 1.0, 1.0
    composed = compose_homographies(h1, h2)
    expect = _as_matrix(h2) @ _as_matrix(h1)
    np.testing.assert_allclose(_as_matrix(composed), expect, rtol=1e-13)


def test_inverse_special_case_matches_general():
    # No-rotation path (gdal_homography.cpp:445-460) vs the adjoint
    # path on a perturbed copy that misses the special-case guard.
    h = np.array([3.0, 2.0, 0.0, -5.0, 0.0, 4.0, 2.0, 0.0, 0.0])
    inv_special = inv_homography(h)
    h_gen = h.copy()
    h_gen[2] = 1e-300  # falls through to the determinant path
    inv_general = inv_homography(h_gen)
    np.testing.assert_allclose(inv_special, inv_general, atol=1e-12)
    x, y = apply_homography(h, np.array([1.5, -2.0]), np.array([0.25, 3.0]))
    bx, by = apply_homography(inv_special, x, y)
    np.testing.assert_allclose(bx, [1.5, -2.0], atol=1e-12)
    np.testing.assert_allclose(by, [0.25, 3.0], atol=1e-12)


def test_inverse_roundtrip_projective():
    h = np.array([10.0, 0.5, 0.25, -20.0, 0.125, -0.75, 1.0, 1 / 512, 1 / 1024])
    inv = inv_homography(h)
    assert inv is not None
    px = np.linspace(0, 2000, 23)
    py = np.linspace(0, 1400, 23)
    x, y = apply_homography(h, px, py)
    bx, by = apply_homography(inv, x, y)
    np.testing.assert_allclose(bx, px, atol=1e-9)
    np.testing.assert_allclose(by, py, atol=1e-9)


def test_singular_inverse_returns_none():
    # Rank-deficient: second row is a multiple of the first.
    h = np.array([0.0, 1.0, 2.0, 0.0, 2.0, 4.0, 1.0, 0.0, 0.0])
    assert inv_homography(h) is None


def test_fit_recovers_true_homography():
    h_true = np.array([10.0, 0.5, 0.25, -20.0, 0.125, -0.75, 1.0, 1 / 512, 1 / 1024])
    pts = [(0.0, 0.0), (2048.0, 0.0), (0.0, 2048.0), (2048.0, 2048.0), (1024.0, 1024.0)]
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    gx, gy = apply_homography(h_true, px, py)
    h_fit = gcps_to_homography(list(zip(px, py, gx, gy)))
    # Evaluate on a grid — the fit agrees with the truth far below the
    # x1024 quantization used by the driver query.
    qx, qy = np.meshgrid(np.arange(700.0, 2000.0, 37.0), np.arange(100.0, 1400.0, 41.0))
    x_t, y_t = apply_homography(h_true, qx.ravel(), qy.ravel())
    x_f, y_f = apply_homography(h_fit, qx.ravel(), qy.ravel())
    assert np.max(np.abs(x_t - x_f)) < 1e-9
    assert np.max(np.abs(y_t - y_f)) < 1e-9


def test_quantization_margin_dominates_fit_noise():
    """The driver oracle hard-codes the true h while the Spark side
    uses the fit: prove no sf0.01-shaped pixel sits within 1e-5 of a
    floor(v*1024+0.5) boundary while the fit error is < 1e-9."""
    h_true = np.array([10.0, 0.5, 0.25, -20.0, 0.125, -0.75, 1.0, 1 / 512, 1 / 1024])
    ids = np.arange(200000)
    keep = (ids % 10 != 0) & (ids % 10 != 7) & (ids % 1000 != 999)
    px = (440720 + (ids * 9973) % 1200)[keep] - 440000.0
    py = (3750120 + (ids * 7919) % 1200)[keep] - 3750000.0
    # hot-cell points too (id % 10 == 0, not invalid)
    hot = (ids % 10 == 0) & (ids % 1000 != 999)
    hx = (440900 + (ids // 10) % 25)[hot] - 440000.0
    hy = (3750300 + (ids // 20) % 25)[hot] - 3750000.0
    px = np.concatenate([px, hx])
    py = np.concatenate([py, hy])
    for v in apply_homography(h_true, px, py):
        frac = np.abs((v * 1024 + 0.5) - np.round(v * 1024 + 0.5))
        assert frac.min() > 1e-5


def test_affine_fallback_under_four_gcps():
    gcps = [(0.0, 0.0, 10.0, -20.0), (8.0, 0.0, 14.0, -19.0), (0.0, 8.0, 12.0, -26.0)]
    h = gcps_to_homography(gcps)
    assert h[6] == 1.0 and h[7] == 0.0 and h[8] == 0.0
    x, y = apply_homography(h, np.array([0.0, 8.0, 0.0]), np.array([0.0, 0.0, 8.0]))
    np.testing.assert_allclose(x, [10.0, 14.0, 12.0], atol=1e-12)
    np.testing.assert_allclose(y, [-20.0, -19.0, -26.0], atol=1e-12)


def test_degenerate_extent_raises():
    gcps = [(0.0, 0.0, 1.0, 2.0), (0.0, 1.0, 3.0, 4.0), (0.0, 2.0, 5.0, 6.0), (0.0, 3.0, 7.0, 8.0)]
    with pytest.raises(ValueError, match="degenerate"):
        gcps_to_homography(gcps)


def test_nonconvex_mapping_raises():
    # Swap two target corners so the unit square's image self-crosses.
    gcps = [
        (0.0, 0.0, 0.0, 0.0),
        (1.0, 0.0, 1.0, 1.0),  # swapped with the (1,1) target
        (1.0, 1.0, 1.0, 0.0),
        (0.0, 1.0, 0.0, 1.0),
    ]
    with pytest.raises(ValueError, match="non-convex|singular|pinning"):
        gcps_to_homography(gcps)


def test_transformer_forward_inverse_consistent():
    from gdal_spark.queries import _homography_gcps

    t = HomographyTransformer(_homography_gcps())
    px = np.array([720.0, 1919.0, 1000.0])
    py = np.array([120.0, 1319.0, 700.0])
    x, y = t.forward(px, py)
    bx, by = t.inverse(x, y)
    np.testing.assert_allclose(bx, px, atol=1e-9)
    np.testing.assert_allclose(by, py, atol=1e-9)
