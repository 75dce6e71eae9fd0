"""Blend kernels vs an independent scalar port of the reference byte
math (apps/gdalalg_raster_blend.cpp)."""

import numpy as np
import pytest

from gdal_spark.operators.blend import blend_arrays

# ---------------------------------------------------------------------------
# scalar replica (straight transliteration, per pixel, Python ints)


def _gb(x):
    return x & 0xFF


def mul255(a, b):
    return (_gb(a) * _gb(b) + 255) // 256


def div255(a, b):
    a = _gb(a)
    if a == 0:
        return 0
    if b == 0:
        return 255
    return _gb((a * 255) // b)


def process_alpha(a, oa, opacity, swapped):
    if not swapped:
        oa2 = mul255(oa, opacity) if oa is not None else opacity
        a2 = a if a is not None else 255
    else:
        oa2 = oa if oa is not None else 255
        a2 = mul255(a, opacity) if a is not None else opacity
    return a2, oa2, _gb(oa2 + a2 - mul255(oa2, a2))


def premult(c, a, fallback):
    if a == 255:
        return c if c is not None else fallback
    return mul255(c, a) if c is not None else fallback_mul(fallback, a)


def fallback_mul(fb, a):
    # pabyR null -> A; pabyG/B null -> outR (fb already resolved)
    return fb


def scalar_blend(mode, color_px, overlay_px, opacity, swapped):
    """color_px/overlay_px: tuples of 1/2/3/4 ints."""

    def split(t):
        n = len(t)
        if n == 1:
            return t[0], None, None, None
        if n == 2:
            return t[0], None, None, t[1]
        if n == 3:
            return t[0], t[1], t[2], None
        return t

    if mode == "hard-light":
        return scalar_blend("overlay", overlay_px, color_px, opacity, not swapped)

    r, g, b, a = split(color_px)
    orr, og, ob, oa = split(overlay_px)
    n_in = 1 + (2 if g is not None else 0) + (1 if a is not None else 0)
    n_ov = 1 + (2 if og is not None else 0) + (1 if oa is not None else 0)
    n_out = max(n_in, n_ov)
    na, noa, fa = process_alpha(a, oa, opacity, swapped)

    def pm(rr, gg, bb, aa):
        if aa == 255:
            pr = rr if rr is not None else 255
        else:
            pr = mul255(rr, aa) if rr is not None else aa
        pg = (gg if aa == 255 else mul255(gg, aa)) if gg is not None else pr
        pb = (bb if aa == 255 else mul255(bb, aa)) if bb is not None else pr
        return pr, pg, pb

    pr, pg, pb = pm(r, g, b, na)
    por, pog, pob = pm(orr, og, ob, noa)

    def comp(c, oc):
        if mode == "multiply":
            return div255(mul255(c, oc) + mul255(c, 255 - noa) + mul255(oc, 255 - na), fa)
        if mode == "screen":
            return div255(c + oc - mul255(c, oc), fa)
        if mode == "overlay":
            if 2 * c < na:
                return div255(
                    2 * mul255(c, oc) + mul255(c, 255 - noa) + mul255(oc, 255 - na), fa
                )
            return div255(
                mul255(noa, na)
                - 2 * mul255(na - c, noa - oc)
                + mul255(c, 255 - noa)
                + mul255(oc, 255 - na),
                fa,
            )
        if mode == "darken":
            return div255(
                min(mul255(oc, na), mul255(c, noa))
                + mul255(c, 255 - noa)
                + mul255(oc, 255 - na),
                fa,
            )
        if mode == "lighten":
            return div255(
                max(mul255(oc, na), mul255(c, noa))
                + mul255(c, 255 - noa)
                + mul255(oc, 255 - na),
                fa,
            )
        if mode == "color-dodge":
            am = mul255(noa, na)
            tail = mul255(c, 255 - noa) + mul255(oc, 255 - na)
            if mul255(oc, na) + mul255(c, noa) >= am:
                return div255(am + tail, fa)
            return div255(div255(mul255(c, noa), 255 - div255(oc, noa)) + tail, fa)
        if mode == "color-burn":
            am = mul255(noa, na)
            tail = mul255(c, 255 - noa) + mul255(oc, 255 - na)
            if mul255(oc, na) + mul255(c, noa) <= am:
                return div255(tail, fa)
            return div255(mul255(am, div255(c, na) + div255(oc, noa) - 255) + tail, fa)
        raise AssertionError(mode)

    out = [comp(pr, por)]
    if n_out == 2:
        out.append(fa)
    else:
        if n_out >= 3:
            out += [comp(pg, pog), comp(pb, pob)]
        if n_out == 4:
            out.append(fa)
    return out


def scalar_src_over(color_px, overlay_px, opacity):
    r, g, b, a = color_px
    orr, og, ob, oa = overlay_px
    noa = (oa * opacity + 255) // 256
    src_am = (a * (255 - noa) + 255) // 256
    dst_a = _gb(noa + src_am)
    inv = 0 if dst_a == 0 else ((255 << 8) + dst_a // 2) // dst_a

    def ch(c, oc):
        pre = _gb((oc * noa + c * src_am + 255) // 256)
        return _gb((pre * inv + 255) >> 8)

    return [ch(r, orr), ch(g, og), ch(b, ob), dst_a]


GENERIC_MODES = [
    "multiply",
    "screen",
    "overlay",
    "hard-light",
    "darken",
    "lighten",
    "color-dodge",
    "color-burn",
]


def _rand_bands(rng, n, size):
    return [rng.integers(0, 256, size=size, dtype=np.uint8) for _ in range(n)]


@pytest.mark.parametrize("mode", GENERIC_MODES)
@pytest.mark.parametrize("nc,no", [(4, 4), (3, 3), (3, 4), (4, 3), (2, 2), (1, 1), (1, 4)])
def test_generic_modes_match_scalar(mode, nc, no):
    if mode in ("darken", "lighten", "color-dodge", "color-burn") and nc != no:
        # reference requires equal color band count for these
        ncol = nc - (1 if nc in (2, 4) else 0)
        nov = no - (1 if no in (2, 4) else 0)
        if ncol != nov:
            pytest.skip("band mismatch invalid for this mode")
    rng = np.random.default_rng(mode.__hash__() % 2**32 + nc * 10 + no)
    color = _rand_bands(rng, nc, 257)
    overlay = _rand_bands(rng, no, 257)
    for opacity_pct in (100, 60):
        got = blend_arrays(mode, color, overlay, opacity_pct)
        opacity = (opacity_pct * 255 + 50) // 100
        # replicate RunStep's commutative swap
        c_px, o_px, swapped = color, overlay, False
        if mode in ("multiply", "screen", "hard-light", "overlay") and nc < no:
            c_px, o_px, swapped = overlay, color, True
        for i in range(len(color[0])):
            expect = scalar_blend(
                mode,
                tuple(int(bb[i]) for bb in c_px),
                tuple(int(bb[i]) for bb in o_px),
                opacity,
                swapped,
            )
            actual = [int(bb[i]) for bb in got]
            assert actual == expect, (mode, nc, no, opacity_pct, i)


def test_src_over_matches_scalar():
    rng = np.random.default_rng(42)
    color = _rand_bands(rng, 4, 513)
    overlay = _rand_bands(rng, 4, 513)
    for opacity_pct in (100, 35):
        got = blend_arrays("src-over", color, overlay, opacity_pct)
        opacity = (opacity_pct * 255 + 50) // 100
        for i in range(513):
            expect = scalar_src_over(
                tuple(int(b[i]) for b in color), tuple(int(b[i]) for b in overlay), opacity
            )
            assert [int(b[i]) for b in got] == expect, i


def test_hsv_value_roundtrip_gray_and_known():
    # s == 0 (gray base): output = v in all channels
    v = np.arange(256, dtype=np.uint8)
    gray = [v.copy(), v.copy(), v.copy()]
    new_v = np.roll(v, 13)
    out = blend_arrays("hsv-value", gray, [new_v])
    for ch in out:
        np.testing.assert_array_equal(ch, new_v)
    # pure red base keeps hue: r stays max, g/b scale with v
    r = np.full(5, 200, np.uint8)
    g = np.full(5, 40, np.uint8)
    b = np.full(5, 40, np.uint8)
    vv = np.array([0, 64, 128, 200, 255], np.uint8)
    rr, gg, bb = blend_arrays("hsv-value", [r, g, b], [vv])
    np.testing.assert_array_equal(rr, vv)  # value channel becomes the max
    assert np.all(gg == bb)


def test_hsv_value_alpha_passthrough_and_errors():
    rng = np.random.default_rng(3)
    color = _rand_bands(rng, 4, 64)
    out = blend_arrays("hsv-value", color, [color[0]])
    assert len(out) == 4
    np.testing.assert_array_equal(out[3], color[3])
    with pytest.raises(ValueError):
        blend_arrays("hsv-value", color, [color[0]], opacity_pct=50)
    with pytest.raises(ValueError):
        blend_arrays("src-over", color[:3], [color[0]] * 3)


def test_blend_tiles_spark(spark):
    import pandas as pd

    rng = np.random.default_rng(9)

    def tiles_df(n_bands, seed):
        r = np.random.default_rng(seed)
        rows = []
        arrs = {}
        for ty in range(2):
            for tx in range(2):
                for b in range(1, n_bands + 1):
                    a = r.integers(0, 256, size=(8, 8), dtype=np.uint8)
                    arrs[(ty, tx, b)] = a
                    rows.append(
                        {"band": b, "ty": ty, "tx": tx, "h": 8, "w": 8,
                         "dtype": "uint8", "payload": a.tobytes()}
                    )
        from gdal_spark.operators.raster import TILE_SCHEMA

        return spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA), arrs

    from gdal_spark.operators.blend import blend_tiles

    c_df, c_arr = tiles_df(4, 1)
    o_df, o_arr = tiles_df(4, 2)
    out = blend_tiles(c_df, o_df, "multiply", 60).collect()
    assert len(out) == 16  # 4 tiles x 4 output bands
    for row in out:
        key = (row.ty, row.tx)
        color = [c_arr[(row.ty, row.tx, b)] for b in range(1, 5)]
        overlay = [o_arr[(row.ty, row.tx, b)] for b in range(1, 5)]
        expect = blend_arrays("multiply", color, overlay, 60)[row.band - 1]
        got = np.frombuffer(row.payload, dtype=np.uint8).reshape(8, 8)
        np.testing.assert_array_equal(got, expect, err_msg=str((key, row.band)))
