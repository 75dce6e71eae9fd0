"""Property-based tests (hypothesis) for the PNG codec and the WKT
measure parser — randomized round-trip invariants on top of the
example-based suites."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from gdal_spark.geom.wkt import parse_wkt, parse_wkt_m, parse_wkt_z, to_wkt
from gdal_spark.png import decode_png, encode_png


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_shape(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
    back = decode_png(encode_png(img))
    np.testing.assert_array_equal(back, img)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    n=st.integers(2, 12),
    seed=st.integers(0, 2**31 - 1),
    variant=st.sampled_from(["", "Z", "M", "ZM"]),
)
def test_wkt_measure_roundtrip_linestring(n, seed, variant):
    """Build a LINESTRING [Z|M|ZM], parse all three channels, and
    check each extractor returns exactly its column (zeros where the
    variant lacks it)."""
    rng = np.random.default_rng(seed)
    xs = rng.integers(-100, 100, n)
    ys = rng.integers(-100, 100, n)
    zs = rng.integers(-50, 50, n)
    ms = rng.integers(-50, 50, n)

    def coord(i):
        parts = [str(xs[i]), str(ys[i])]
        if "Z" in variant:
            parts.append(str(zs[i]))
        if "M" in variant:
            parts.append(str(ms[i]))
        return " ".join(parts)

    tok = f"{variant} " if variant else ""
    wkt = f"LINESTRING {tok}(" + ", ".join(coord(i) for i in range(n)) + ")"
    batch = parse_wkt([wkt])
    assert to_wkt(batch)[0].startswith("LINESTRING")
    got_z = parse_wkt_z([wkt])[0][0][0]
    got_m = parse_wkt_m([wkt])[0][0][0]
    want_z = zs if "Z" in variant else np.zeros(n)
    want_m = ms if "M" in variant else np.zeros(n)
    np.testing.assert_array_equal(got_z, want_z.astype(float))
    np.testing.assert_array_equal(got_m, want_m.astype(float))
    # the XY channel never absorbs a Z or M column
    _, parts = batch.geometry(0)
    np.testing.assert_array_equal(parts[0][0][:, 0], xs.astype(float))
    np.testing.assert_array_equal(parts[0][0][:, 1], ys.astype(float))
