"""Warp cutline tests (alg/gdalcutline.cpp: GDALWarpCutlineMaskerEx +
BlendMaskGenerator), mirroring autotest/alg/warp.py cutline coverage:
mask rasterization (center rule / ALL_TOUCHED), blend-distance ramp,
window-seam exactness, and the raster_tile application."""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.fixtures import BYTE20_SPEC, byte20_tiles
from gdal_spark.geom.proj import EPSG_26711, Pipeline
from gdal_spark.operators.cutline import (
    _boundary_segments,
    cutline_validity,
    parse_cutline,
)
from gdal_spark.operators.raster import shape_mask
from gdal_spark.operators.tiles import raster_tile

DIAMOND = "POLYGON((10 2, 18 10, 10 18, 2 10, 10 2))"
RECT_FRAC = "POLYGON((3.3 4.2, 15.7 4.2, 15.7 17.9, 3.3 17.9, 3.3 4.2))"


def _scalar_blend_replica(parts, x0, y0, h, w, blend):
    """Per-pixel replica of BlendMaskGenerator (gdalcutline.cpp:52):
    exact point-to-boundary distance, inside/outside 0.5 +- ramp."""
    from gdal_spark.operators.raster import _polygon_mask

    base = np.zeros((h, w), dtype=bool)
    for rings in parts:
        base |= _polygon_mask(rings, h, w, oy=y0, ox=x0)
    segs = _boundary_segments(parts)
    out = np.zeros((h, w), dtype=np.float32)
    for i in range(h):
        for j in range(w):
            px, py = x0 + j + 0.5, y0 + i + 0.5
            d = math.inf
            for (x1, y1, x2, y2) in segs:
                dx, dy = x2 - x1, y2 - y1
                L2 = dx * dx + dy * dy
                t = 0.0 if L2 == 0 else max(0.0, min(1.0, ((px - x1) * dx + (py - y1) * dy) / L2))
                d = min(d, math.hypot(px - (x1 + t * dx), py - (y1 + t * dy)))
            if d > blend:
                out[i, j] = 1.0 if base[i, j] else 0.0
            else:
                out[i, j] = 0.5 + (d / blend) * 0.5 if base[i, j] else 0.5 - (d / blend) * 0.5
    return out


class TestCutlineValidity:
    def test_center_rule_matches_rasterize(self):
        """Blend 0 mask == the engine's own polygon scanline fill
        (which is pinned against llrasterize.cpp fixtures)."""
        from gdal_spark.geom.batch import GeomType

        parts = parse_cutline(DIAMOND)
        got = cutline_validity(parts, 0, 0, 20, 20, 0.0)
        want = shape_mask(GeomType.POLYGON, parts, BYTE20_SPEC, 20, 20)
        np.testing.assert_array_equal(got, want.astype(np.float32))

    def test_fractional_rect_rounding(self):
        """Center rule with floor(x+0.5) crossings: rect 3.3..15.7
        covers columns 3..15, rows where ymin <= y+0.5 < ymax."""
        parts = parse_cutline(RECT_FRAC)
        m = cutline_validity(parts, 0, 0, 20, 20, 0.0)
        cols = np.flatnonzero(m.any(axis=0))
        rows = np.flatnonzero(m.any(axis=1))
        assert cols.min() == 3 and cols.max() == 15
        assert rows.min() == 4 and rows.max() == 17

    def test_window_seams_bit_exact(self):
        """Mask evaluated per source window (as the warp tasks do)
        equals the whole-raster evaluation on every pixel."""
        parts = parse_cutline(DIAMOND)
        whole = cutline_validity(parts, 0, 0, 20, 20, 1.5)
        pieces = np.zeros((20, 20), dtype=np.float32)
        for y0, x0, h, w in [(0, 0, 11, 7), (0, 7, 11, 13), (11, 0, 9, 20)]:
            pieces[y0 : y0 + h, x0 : x0 + w] = cutline_validity(parts, x0, y0, h, w, 1.5)
        np.testing.assert_array_equal(whole, pieces)

    def test_blend_matches_scalar_replica(self):
        parts = parse_cutline(DIAMOND)
        got = cutline_validity(parts, 0, 0, 20, 20, 2.0)
        want = _scalar_blend_replica(parts, 0, 0, 20, 20, 2.0)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
        # ramp straddles the boundary: strictly between 0 and 1 there
        assert ((got > 0) & (got < 1)).sum() > 20

    def test_all_touched_superset(self):
        parts = parse_cutline(DIAMOND)
        center = cutline_validity(parts, 0, 0, 20, 20, 0.0)
        touched = cutline_validity(parts, 0, 0, 20, 20, 0.0, all_touched=True)
        assert (touched >= center).all() and touched.sum() > center.sum()

    def test_non_polygon_rejected(self):
        with pytest.raises(ValueError):
            parse_cutline("LINESTRING(0 0, 5 5)")


class TestRasterTileCutline:
    def test_near_blend0_masks_source_pixels(self, spark):
        """Nearest + blend 0 is bit-exact: each dst pixel keeps its
        no-cutline value iff its nearest source pixel is inside the
        cutline mask, else 0; alpha likewise."""
        src = byte20_tiles(spark)
        pipe = Pipeline(src=EPSG_26711, dst="webmercator")
        plain = raster_tile(src, BYTE20_SPEC, pipe, min_zoom=11, max_zoom=11, resampling="near").collect()
        cut = raster_tile(
            src, BYTE20_SPEC, pipe, min_zoom=11, max_zoom=11, resampling="near",
            cutline=DIAMOND,
        ).collect()

        def grab(rows, band):
            r = [x for x in rows if x.band == band][0]
            return np.frombuffer(r.payload, dtype=r.dtype).reshape(256, 256)

        from gdal_spark.geom.batch import GeomType
        from gdal_spark.operators.tiles import WebMercatorQuad, _dst_pixel_src_coords

        parts = parse_cutline(DIAMOND)
        mask20 = shape_mask(GeomType.POLYGON, parts, BYTE20_SPEC, 20, 20)
        sx, sy = _dst_pixel_src_coords(WebMercatorQuad(), 11, 354, 818, pipe, BYTE20_SPEC)
        isx = np.clip((sx + 1e-10).astype(np.int64), 0, 19)
        isy = np.clip((sy + 1e-10).astype(np.int64), 0, 19)
        inside = mask20[isy, isx]

        b_plain, a_plain = grab(plain, 1), grab(plain, 2)
        b_cut, a_cut = grab(cut, 1), grab(cut, 2)
        np.testing.assert_array_equal(b_cut, np.where(inside, b_plain, 0))
        np.testing.assert_array_equal(a_cut, np.where(inside, a_plain, 0))

    def test_blend_scales_values_and_alpha(self, spark):
        src = byte20_tiles(spark)
        pipe = Pipeline(src=EPSG_26711, dst="webmercator")
        cut = raster_tile(
            src, BYTE20_SPEC, pipe, min_zoom=11, max_zoom=11, resampling="near",
            cutline=DIAMOND, cutline_blend_dist=2.0,
        ).collect()
        a = np.frombuffer([x for x in cut if x.band == 2][0].payload, dtype="uint8").reshape(256, 256)
        # ramp produces intermediate alpha values, not just 0/255
        assert ((a > 0) & (a < 255)).sum() > 0


class TestBilinearDensityRenorm:
    """Per-sample cutline-density handling for non-nearest kernels vs
    a scalar replica of GWKBilinearResample4Sample
    (gdalwarpkernel.cpp:2952-3100): samples at density <= 1e-9 are
    skipped, the retained weights renormalize, the VALUE stays
    unpremultiplied, and the dst density (sum(w*d)/sum(w)) feeds alpha;
    a dst pixel below the 0.0001 density floor is not set
    (GWKSetPixelValue :1804-1806)."""

    def test_bilinear_blend_matches_scalar_replica(self, spark):
        from gdal_spark.operators.tiles import (
            WebMercatorQuad,
            _dst_pixel_src_coords,
        )
        from gdal_spark.operators.raster import RasterSpec

        rng = np.random.default_rng(5)
        arr = rng.integers(10, 250, (20, 20)).astype(np.float64)
        spec = RasterSpec(width=20, height=20, gt=BYTE20_SPEC.gt, dtype="float64", tile_size=16)
        rows = []
        for ty in range(spec.ntiles_y):
            for tx in range(spec.ntiles_x):
                h, w = spec.tile_shape(ty, tx)
                rows.append((1, ty, tx, h, w, "float64",
                             arr[ty*16:ty*16+h, tx*16:tx*16+w].tobytes()))
        df = spark.createDataFrame(
            rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary")
        pipe = Pipeline(src=EPSG_26711, dst="webmercator")
        blend = 2.5
        got = raster_tile(df, spec, pipe, 11, 11, "bilinear",
                          cutline=DIAMOND, cutline_blend_dist=blend).collect()

        def grab(band):
            r = [x for x in got if x.band == band][0]
            return np.frombuffer(r.payload, dtype=r.dtype).reshape(256, 256)

        vals, alpha = grab(1), grab(2)
        cl = cutline_validity(parse_cutline(DIAMOND), 0, 0, 20, 20, blend, False).astype(np.float64)
        sx, sy = _dst_pixel_src_coords(WebMercatorQuad(), 11, 354, 818, pipe, spec)

        checked = 0
        partial = 0
        for i in range(256):
            for j in range(256):
                fx, fy = sx[i, j], sy[i, j]
                isx, isy = math.floor(fx - 0.5), math.floor(fy - 0.5)
                if not (0 <= isx < 19 and 0 <= isy < 19):
                    continue  # interior 2x2 only (no border degradation)
                rx, ry = 1.5 - (fx - isx), 1.5 - (fy - isy)
                acc = accd = div = 0.0
                for dy, dx, m in ((0, 0, rx*ry), (0, 1, (1-rx)*ry),
                                  (1, 0, rx*(1-ry)), (1, 1, (1-rx)*(1-ry))):
                    y, x = isy + dy, isx + dx
                    if cl[y, x] > 1e-9:
                        acc += arr[y, x] * m
                        accd += cl[y, x] * m
                        div += m
                if div <= 1e-10:
                    want_valid = False
                else:
                    d = accd / div
                    want_valid = d >= 0.0001
                if want_valid:
                    assert vals[i, j] == pytest.approx(acc / div, rel=1e-12), (i, j)
                    assert alpha[i, j] == int(math.floor(255.0 * d + 0.5)), (i, j)
                    if 0 < d < 1:
                        partial += 1
                        # unpremultiplied: the value must NOT be scaled
                        assert vals[i, j] != pytest.approx((acc / div) * d, abs=1e-9) or acc == 0
                else:
                    assert vals[i, j] == 0.0 and alpha[i, j] == 0, (i, j)
                checked += 1
        assert checked > 250
        assert partial > 20  # the blend seam was actually exercised
