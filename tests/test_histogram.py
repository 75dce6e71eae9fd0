"""GDALRasterBand::GetHistogram semantics (gcore/gdalrasterband.cpp:4224).

Pins the distributed band_histogram against numpy replicas of the
reference's bucket rule on the byte20 fixture (autotest byte.tif):
floor((v - min) * buckets / (max - min)) indexing, out-of-range
clamp-vs-drop, nodata skipping, the sparse-tile init correction, and
the GetDefaultHistogram bounds table.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.raster import band_histogram, default_histogram_range


def _ref_hist(values, dfmin, dfmax, buckets, include_oor=False, nodata=None):
    """Scalar replica of the reference loop (gdalrasterband.cpp:4513)."""
    out = np.zeros(buckets, dtype=np.int64)
    scale = buckets / (dfmax - dfmin)
    for v in np.asarray(values, dtype=np.float64).ravel():
        if np.isnan(v) or (nodata is not None and v == nodata):
            continue
        idx = int(np.floor((v - dfmin) * scale))
        if idx < 0:
            if include_oor:
                out[0] += 1
        elif idx >= buckets:
            if include_oor:
                out[buckets - 1] += 1
        else:
            out[idx] += 1
    return out


def _collect(df):
    got = np.zeros(4096, dtype=np.int64)
    n = 0
    for r in df.collect():
        assert r["band"] == 1
        got[r["bucket"]] += r["count"]
        n = max(n, r["bucket"] + 1)
    return got


def test_byte_default_histogram_matches_reference(spark):
    dfmin, dfmax, buckets = default_histogram_range("uint8")
    df = band_histogram(byte20_tiles(spark), BYTE20_SPEC, dfmin, dfmax, buckets, include_out_of_range=True)
    got = _collect(df)
    ref = _ref_hist(BYTE20, dfmin, dfmax, buckets, include_oor=True)
    assert np.array_equal(got[:buckets], ref)
    assert got[:buckets].sum() == 400


def test_narrow_range_drop_vs_clamp(spark):
    # range [100, 150), 5 buckets of width 10 — byte20 has plenty outside
    tiles = byte20_tiles(spark)
    for include in (False, True):
        df = band_histogram(tiles, BYTE20_SPEC, 100.0, 150.0, 5, include_out_of_range=include)
        got = _collect(df)
        ref = _ref_hist(BYTE20, 100.0, 150.0, 5, include_oor=include)
        assert np.array_equal(got[:5], ref), f"include_out_of_range={include}"
    # the two modes must genuinely differ on this fixture
    assert (BYTE20 < 100).sum() > 0 and (BYTE20 >= 150).sum() > 0


def test_nodata_skipped(spark):
    dfmin, dfmax, buckets = default_histogram_range("uint8")
    df = band_histogram(
        byte20_tiles(spark), BYTE20_SPEC, dfmin, dfmax, buckets,
        include_out_of_range=True, nodata=132.0,
    )
    got = _collect(df)
    ref = _ref_hist(BYTE20, dfmin, dfmax, buckets, include_oor=True, nodata=132.0)
    assert np.array_equal(got[:buckets], ref)
    assert got[132] == 0


def test_sparse_tiles_credit_init_bucket(spark):
    # drop one full 16x16 tile: its 256 pixels must show up in bucket 0
    # (spec.init == 0), exactly as if the raster were dense zeros there
    tiles = byte20_tiles(spark).filter("NOT (ty = 0 AND tx = 0)")
    dfmin, dfmax, buckets = default_histogram_range("uint8")
    df = band_histogram(tiles, BYTE20_SPEC, dfmin, dfmax, buckets, include_out_of_range=True)
    got = _collect(df)
    dense = BYTE20.copy()
    dense[:16, :16] = 0
    ref = _ref_hist(dense, dfmin, dfmax, buckets, include_oor=True)
    assert np.array_equal(got[:buckets], ref)
    assert got[:buckets].sum() == 400


def test_default_range_table():
    assert default_histogram_range("uint8") == (-0.5, 255.5, 256)
    assert default_histogram_range("int8") == (-128.5, 127.5, 256)
    # stats path: half-bucket expansion with 2*(n-1) denominator
    dfmin, dfmax, buckets = default_histogram_range("float64", 10.0, 20.0)
    half = (20.0 - 10.0) / (2 * 255)
    assert buckets == 256
    assert dfmin == pytest.approx(10.0 - half)
    assert dfmax == pytest.approx(20.0 + half)
    # degenerate min == max -> single widened bucket
    assert default_histogram_range("int32", 7.0, 7.0) == (6.5, 7.5, 1)
    with pytest.raises(ValueError):
        default_histogram_range("float32")


class TestAbsentBand:
    def test_band_with_zero_tiles_gets_init_credit(self, spark):
        """A band with NO materialized tiles must still report its
        width*height init pixels (bands seed from spec.nbands — same
        rule as raster_info's all-init band)."""
        from gdal_spark.operators.raster import RasterSpec, band_histogram

        spec = RasterSpec(width=8, height=8, gt=(0, 1, 0, 8, 0, -1),
                          dtype="uint8", nbands=3, tile_size=8, init=5.0)
        tiles = spark.createDataFrame(
            [(1, 0, 0, 8, 8, "uint8", bytes(bytearray(range(64))))],
            "band int, ty int, tx int, h int, w int, dtype string, payload binary",
        )
        out = band_histogram(tiles, spec, 0.0, 64.0, 8)
        rows = {(r["band"], r["bucket"]): r["count"] for r in out.collect()}
        # bands 2 and 3 have zero tiles -> 64 init pixels in bucket of 5
        assert rows[(2, 0)] == 64 and rows[(3, 0)] == 64
        assert sum(v for (b, _), v in rows.items() if b == 1) == 64
