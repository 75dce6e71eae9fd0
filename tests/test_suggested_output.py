"""GDALSuggestedWarpOutput2 replica (operators/tiles.py
suggested_warp_output — alg/gdaltransformer.cpp:342): edge-walk
sampling, diagonal pixel sizing, border-adjust ladder."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.fixtures import BYTE20_SPEC
from gdal_spark.geom.proj import Pipeline, utm
from gdal_spark.operators.raster import RasterSpec
from gdal_spark.operators.tiles import suggested_warp_output


class TestSuggestedWarpOutput:
    def test_identity_preserves_grid(self):
        """Identity transform on a north-up raster: suggested output
        is the input grid exactly (diag sizing is exact here)."""
        gt, pixels, lines, extent = suggested_warp_output(BYTE20_SPEC, Pipeline())
        assert (pixels, lines) == (BYTE20_SPEC.width, BYTE20_SPEC.height)
        g = BYTE20_SPEC.gt
        assert gt[0] == pytest.approx(g[0])
        assert gt[3] == pytest.approx(g[3])
        assert gt[1] == pytest.approx(g[1], rel=1e-9)
        assert gt[5] == pytest.approx(g[5], rel=1e-9)

    def test_utm_to_webmercator_covers_forward_extent(self):
        """byte.tif-shaped raster warped UTM11->WebMercator: the
        suggested extent covers every edge sample and the pixel count
        approximately preserves the source diagonal."""
        pipe = Pipeline(src=utm(11), dst="webmercator")
        gt, pixels, lines, extent = suggested_warp_output(BYTE20_SPEC, pipe)
        # sample the edges densely, all must fall inside the extent
        t = np.linspace(0, 20, 200)
        px = np.concatenate([t, t, np.zeros(200), np.full(200, 20.0)])
        py = np.concatenate([np.zeros(200), np.full(200, 20.0), t, t])
        wx, wy = BYTE20_SPEC.pixel_to_world(px, py)
        X, Y = pipe.forward(wx, wy)
        # top-left anchors exactly; right/bottom may round by <=1 px
        # (the reference's nearest-rounding of pixels/lines — use
        # round_up=True for guaranteed cover)
        eps = 1e-6
        assert X.min() >= extent[0] - eps and X.max() <= extent[2] + gt[1]
        assert Y.min() >= extent[1] - abs(gt[5]) and Y.max() <= extent[3] + eps
        # square pixels, diagonal roughly preserved (within 2%)
        assert gt[1] == pytest.approx(-gt[5], rel=1e-3)
        src_diag = np.hypot(20, 20)
        out_diag_px = np.hypot((extent[2] - extent[0]) / gt[1], (extent[3] - extent[1]) / gt[1])
        assert out_diag_px == pytest.approx(np.hypot(pixels, lines), rel=0.05)
        assert out_diag_px == pytest.approx(src_diag, rel=0.30)

    def test_round_up_vs_round_nearest(self):
        pipe = Pipeline(src=utm(11), dst="webmercator")
        _, p1, l1, _ = suggested_warp_output(BYTE20_SPEC, pipe, round_up=False)
        _, p2, l2, _ = suggested_warp_output(BYTE20_SPEC, pipe, round_up=True)
        assert p2 >= p1 and l2 >= l1
        assert p2 - p1 <= 1 and l2 - l1 <= 1

    def test_anisotropic_affine_squares_pixels(self):
        """A 2x-wider-pixel source still suggests SQUARE output
        pixels (the reference always emits a square size)."""
        spec = RasterSpec(width=100, height=50,
                         gt=(0.0, 2.0, 0.0, 50.0, 0.0, -1.0), dtype="uint8")
        gt, pixels, lines, extent = suggested_warp_output(spec, Pipeline())
        assert gt[1] == pytest.approx(-gt[5])
        # extent preserved
        assert extent[0] == pytest.approx(0.0)
        assert extent[3] == pytest.approx(50.0)
        assert extent[2] == pytest.approx(200.0, rel=0.02)
        # pixel area conserved-ish: 200x50 world units at square pixel
        assert pixels * gt[1] == pytest.approx(200.0, rel=0.02)
        assert lines * -gt[5] == pytest.approx(50.0, rel=0.02)

    def test_edge_sampling_beats_corner_bbox(self):
        """A transform whose image of a straight edge bulges: corner
        bbox underestimates, edge sampling must not. Use UTM far from
        the central meridian where meridian convergence curves the
        top edge."""
        # 6-degree-wide raster straddling the UTM10 central meridian
        # (-123): northing along a parallel is MINIMAL at the central
        # meridian, so the bottom edge dips below both bottom corners
        spec = RasterSpec(width=600, height=100,
                         gt=(-126.0, 0.01, 0.0, 72.0, 0.0, -0.01), dtype="uint8")
        pipe = Pipeline(src=None, dst=utm(10))  # lon/lat -> UTM meters
        gt, pixels, lines, extent = suggested_warp_output(spec, pipe)
        # corner-only bbox
        cpx = np.array([0.0, 600.0, 0.0, 600.0])
        cpy = np.array([0.0, 0.0, 100.0, 100.0])
        cwx, cwy = spec.pixel_to_world(cpx, cpy)
        cX, cY = pipe.forward(cwx, cwy)
        corner_miny = cY.min()
        # dense truth along the bottom edge
        t = np.linspace(0, 600, 2001)
        wx, wy = spec.pixel_to_world(t, np.full_like(t, 100.0))
        X, Y = pipe.forward(wx, wy)
        true_miny = Y.min()
        assert true_miny < corner_miny - 100.0  # the dip is real (meters)
        # extent bottom covers the dip (within the <=1px rounding slack)
        assert extent[1] <= true_miny + abs(gt[5])
