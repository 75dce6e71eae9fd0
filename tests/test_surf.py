"""SimpleSURF: distributed keypoints/descriptors vs a literal
per-pixel replica of gdal_octave.cpp + gdal_simplesurf.cpp."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators.raster import RasterSpec
from gdal_spark.operators.surf import (
    INTERVALS,
    gather_feature_points,
    integral_tiles,
    layer_params,
    match_feature_points,
    set_descriptor,
    surf_keypoints,
)


def _tiles(spark, arr, ts):
    spec = RasterSpec(width=arr.shape[1], height=arr.shape[0],
                      gt=(0, 1, 0, float(arr.shape[0]), 0, -1),
                      dtype=str(arr.dtype), tile_size=ts)
    rows = []
    for ty in range(spec.ntiles_y):
        for tx in range(spec.ntiles_x):
            h, w = spec.tile_shape(ty, tx)
            rows.append((1, ty, tx, h, w, str(arr.dtype),
                         arr[ty * ts : ty * ts + h, tx * ts : tx * ts + w].tobytes()))
    return spark.createDataFrame(
        rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary"
    ), spec


# ---- literal scalar replica -------------------------------------------------


def _integral_ref(img):
    """GDALIntegralImage::Initialize recurrence (gdal_octave.cpp:11-39)."""
    h, w = img.shape
    I = np.zeros((h, w))
    for i in range(h):
        for j in range(w):
            a = I[i - 1, j - 1] if i >= 1 and j >= 1 else 0.0
            b = I[i, j - 1] if j >= 1 else 0.0
            c = I[i - 1, j] if i >= 1 else 0.0
            I[i, j] = img[i, j] - a + b + c
    return I


def _rect_ref(I, row, col, w, h):
    H, W = I.shape
    lt_row = row - 1 if row <= H else -1
    lt_col = col - 1 if col <= W else -1
    rb_row = row + h - 1 if row + h - 1 < H else H - 1
    rb_col = col + w - 1 if col + w - 1 < W else W - 1

    def val(r, c):
        return I[r, c] if 0 <= r < H and 0 <= c < W else 0.0

    a = val(lt_row, lt_col) if lt_row >= 0 and lt_col >= 0 else 0.0
    b = val(lt_row, rb_col) if lt_row >= 0 and rb_col >= 0 else 0.0
    c = val(rb_row, rb_col) if rb_row >= 0 and rb_col >= 0 else 0.0
    d = val(rb_row, lt_col) if rb_row >= 0 and lt_col >= 0 else 0.0
    res = a + c - b - d
    return res if res > 0 else 0.0


def _layer_ref(I, octave, interval):
    H, W = I.shape
    fs, radius, _ = layer_params(octave, interval)
    lobe = fs // 3
    lp = 2 * lobe - 1
    norm = fs * fs
    det = np.zeros((H, W))
    sign = np.zeros((H, W), dtype=int)
    for r in range(radius, H - radius + 1):
        for c in range(radius, W - radius + 1):
            dxx = _rect_ref(I, r - lobe + 1, c - radius, fs, lp) - 3 * _rect_ref(
                I, r - lobe + 1, c - (lobe - 1) // 2, lobe, lp)
            dyy = _rect_ref(I, r - radius, c - lobe - 1, lp, fs) - 3 * _rect_ref(
                I, r - lobe + 1, c - lobe + 1, lp, lobe)
            dxy = (_rect_ref(I, r - lobe, c - lobe, lobe, lobe)
                   + _rect_ref(I, r + 1, c + 1, lobe, lobe)
                   - _rect_ref(I, r - lobe, c + 1, lobe, lobe)
                   - _rect_ref(I, r + 1, c - lobe, lobe, lobe))
            dxx /= norm
            dyy /= norm
            dxy /= norm
            det[r, c] = dxx * dyy - 0.81 * dxy * dxy
            sign[r, c] = 1 if dxx + dyy >= 0 else -1
    return det, sign


def _extract_ref(img, octave_start, octave_end, threshold):
    I = _integral_ref(img)
    H, W = img.shape
    feats = []
    for octv in range(octave_start, octave_end + 1):
        layers = {k: _layer_ref(I, octv, k) for k in range(1, INTERVALS + 1)}
        for k in range(0, INTERVALS - 2):
            bot = layers[k + 1][0]
            mid, sgn = layers[k + 2]
            top = layers[k + 3][0]
            _, top_radius, _ = layer_params(octv, k + 3)
            _, mid_radius, scale = layer_params(octv, k + 2)
            for i in range(H):
                for j in range(W):
                    if (i <= top_radius or j <= top_radius
                            or i + top_radius >= H or j + top_radius >= W):
                        continue
                    cur = mid[i, j]
                    if cur < threshold:
                        continue
                    ok = True
                    for di in (-1, 0, 1):
                        for dj in (-1, 0, 1):
                            if top[i + di, j + dj] >= cur or bot[i + di, j + dj] >= cur:
                                ok = False
                            if (di, dj) != (0, 0) and mid[i + di, j + dj] >= cur:
                                ok = False
                    if ok:
                        feats.append((octv, k + 2, i, j, scale, mid_radius, sgn[i, j]))
    return I, feats


def _blob_image(rng, h, w, n_blobs=6):
    img = rng.integers(0, 15, (h, w)).astype(np.float64)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n_blobs):
        cy, cx = rng.integers(12, h - 12), rng.integers(12, w - 12)
        s = rng.uniform(2.0, 4.0)
        img += 200.0 * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)))
    return np.floor(img).clip(0, 255).astype(np.float64)  # integer-valued


class TestSurf:
    def test_integral_matches_reference_recurrence(self, spark):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 255, (23, 31)).astype(np.float64)
        tiles, spec = _tiles(spark, img, 8)
        got = np.zeros_like(img)
        for r in integral_tiles(tiles, spec).collect():
            t = np.frombuffer(r.payload, dtype=np.float64).reshape(r.h, r.w)
            got[r.ty * 8 : r.ty * 8 + r.h, r.tx * 8 : r.tx * 8 + r.w] = t
        np.testing.assert_array_equal(got, _integral_ref(img))

    @pytest.mark.parametrize("octaves", [(1, 1), (2, 2), (1, 2)])
    def test_keypoints_match_replica(self, spark, octaves):
        rng = np.random.default_rng(17)
        img = _blob_image(rng, 96, 80)
        tiles, spec = _tiles(spark, img, 32)
        got = sorted(
            (r.octave, r.interval, r.y, r.x, r.scale, r.radius, r.sign)
            for r in surf_keypoints(tiles, spec, *octaves, threshold=0.001).collect()
        )
        _, want = _extract_ref(img, *octaves, 0.001)
        assert got == sorted(want)
        assert len(got) > 0  # the blobs must actually fire

    def test_descriptors_match_replica(self, spark):
        rng = np.random.default_rng(23)
        img = _blob_image(rng, 96, 96)
        tiles, spec = _tiles(spark, img, 32)
        feats = gather_feature_points(tiles, spec, 1, 1, 0.001)
        I, want = _extract_ref(img, 1, 1, 0.001)
        assert len(feats) == len(want)
        for f, (octv, k, y, x, scale, radius, sign) in zip(
            feats, sorted(want, key=lambda t: (t[0], t[1], t[2], t[3]))
        ):
            assert (f["y"], f["x"], f["scale"], f["sign"]) == (y, x, scale, sign)
            ref_desc = set_descriptor(I, *img.shape, y, x, scale)
            np.testing.assert_array_equal(f["desc"], ref_desc)

    def test_descriptors_distributed_multiring(self, spark):
        # octave 2 -> scale 4 -> desc_pad 50 > ts=32: the descriptor
        # cogroup must assemble a 2-ring halo window; parity against
        # whole-image set_descriptor proves the windowed global-clamp
        # path is bit-identical (no driver materialization exists in
        # this path at any raster size — the old max_cells guard and
        # materialize_full are gone)
        rng = np.random.default_rng(17)
        img = _blob_image(rng, 96, 80)
        tiles, spec = _tiles(spark, img, 32)
        feats = gather_feature_points(tiles, spec, 2, 2, 0.001)
        I, want = _extract_ref(img, 2, 2, 0.001)
        assert len(feats) == len(want) > 0
        for f, (octv, k, y, x, scale, radius, sign) in zip(
            feats, sorted(want, key=lambda t: (t[0], t[1], t[2], t[3]))
        ):
            assert (f["y"], f["x"], f["scale"], f["sign"]) == (y, x, scale, sign)
            np.testing.assert_array_equal(
                f["desc"], set_descriptor(I, *img.shape, y, x, scale))

    def test_matching_identical_images(self, spark):
        rng = np.random.default_rng(31)
        img = _blob_image(rng, 96, 96)
        tiles, spec = _tiles(spark, img, 32)
        feats = gather_feature_points(tiles, spec, 1, 1, 0.001)
        assert len(feats) >= 2
        pairs = match_feature_points(feats, list(feats), 0.015)
        # identical collections: self-matches at distance 0 — except
        # points whose FIRST unmatched same-sign candidate is itself
        # (best2 gets initialized to 0 and the `bestDist_2 > 0` guard
        # drops them, gdal_simplesurf.cpp:372) — faithfully replicated
        assert len(pairs) >= int(0.8 * len(feats))
        for a, b in pairs:
            assert (a["x"], a["y"]) == (b["x"], b["y"])

    def test_matching_shifted_image(self, spark):
        rng = np.random.default_rng(37)
        base = _blob_image(rng, 96, 96)
        shifted = np.roll(base, (0, 7), axis=(0, 1))
        t1, spec = _tiles(spark, base, 32)
        t2, _ = _tiles(spark, shifted, 32)
        f1 = gather_feature_points(t1, spec, 1, 1, 0.001)
        f2 = gather_feature_points(t2, spec, 1, 1, 0.001)
        pairs = match_feature_points(f1, f2, 0.9)
        assert pairs, "shifted blobs must still match"
        # matched points predominantly reflect the +7 x-shift
        dx = [b["x"] - a["x"] for a, b in pairs]
        assert np.median(dx) == 7
