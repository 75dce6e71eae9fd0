"""gdaldem edge modes: default border-nodata and -compute_edges
INTERPOL extrapolation (gdaldem_lib.cpp GDALGeneric3x3Processing
:461-760, INTERPOL :292). The oracle below is a per-pixel scalar
transliteration of the reference loop: top/bottom rows extrapolate
vertically with column-clamped sides, interior-row left/right columns
extrapolate horizontally."""

from __future__ import annotations

import dataclasses

import numpy as np

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.focal import (
    aspect,
    aspect_kernel,
    horn_slope_kernel,
    slope,
    tpi,
    tpi_kernel,
)
from gdal_spark.operators.raster import materialize_full

FSPEC = dataclasses.replace(BYTE20_SPEC, dtype="float64")
EW, NS = abs(BYTE20_SPEC.gt[1]), abs(BYTE20_SPEC.gt[5])


def _win_alg(kernel):
    """Run a vectorized 3x3 kernel on ONE window (afWin layout)."""

    def alg(win: list[float]) -> float:
        p = np.array(win, dtype=np.float64).reshape(3, 3)
        return float(kernel(p)[0, 0])

    return alg


def _scalar_compute_edges(arr: np.ndarray, kernel) -> np.ndarray:
    """GDALGeneric3x3Processing with bComputeAtEdges, per-pixel."""
    h, w = arr.shape
    a = arr.astype(np.float64)
    alg = _win_alg(kernel)

    def interpol(x, y):
        return 2.0 * x - y

    out = np.empty((h, w))
    for i in range(h):
        for j in range(w):
            if i == 0 or i == h - 1:
                # top/bottom: vertical INTERPOL, columns clamped
                jmin, jmax = max(j - 1, 0), min(j + 1, w - 1)
                if i == 0:
                    r0, r1 = a[0], a[1]
                    win = [interpol(r0[jmin], r1[jmin]), interpol(r0[j], r1[j]),
                           interpol(r0[jmax], r1[jmax]),
                           r0[jmin], r0[j], r0[jmax],
                           r1[jmin], r1[j], r1[jmax]]
                else:
                    r0, r1 = a[h - 2], a[h - 1]
                    win = [r0[jmin], r0[j], r0[jmax],
                           r1[jmin], r1[j], r1[jmax],
                           interpol(r1[jmin], r0[jmin]), interpol(r1[j], r0[j]),
                           interpol(r1[jmax], r0[jmax])]
            elif j == 0:
                win = [interpol(a[i - 1, 0], a[i - 1, 1]), a[i - 1, 0], a[i - 1, 1],
                       interpol(a[i, 0], a[i, 1]), a[i, 0], a[i, 1],
                       interpol(a[i + 1, 0], a[i + 1, 1]), a[i + 1, 0], a[i + 1, 1]]
            elif j == w - 1:
                win = [a[i - 1, j - 1], a[i - 1, j], interpol(a[i - 1, j], a[i - 1, j - 1]),
                       a[i, j - 1], a[i, j], interpol(a[i, j], a[i, j - 1]),
                       a[i + 1, j - 1], a[i + 1, j], interpol(a[i + 1, j], a[i + 1, j - 1])]
            else:
                win = list(a[i - 1 : i + 2, j - 1 : j + 2].ravel())
            out[i, j] = alg(win)
    return out


def test_slope_interpol_edges_match_scalar(spark):
    k = horn_slope_kernel(EW, NS)
    got = materialize_full(slope(byte20_tiles(spark), FSPEC, edges="interpol"), FSPEC)
    exp = _scalar_compute_edges(BYTE20, k)
    np.testing.assert_array_equal(got, exp)


def test_aspect_interpol_edges_match_scalar(spark):
    k = aspect_kernel()
    got = materialize_full(aspect(byte20_tiles(spark), FSPEC, edges="interpol"), FSPEC)
    exp = _scalar_compute_edges(BYTE20, k)
    np.testing.assert_array_equal(got, exp)


def test_tpi_interpol_edges_match_scalar(spark):
    got = materialize_full(tpi(byte20_tiles(spark), FSPEC, edges="interpol"), FSPEC)
    exp = _scalar_compute_edges(BYTE20, tpi_kernel())
    np.testing.assert_array_equal(got, exp)


def test_nodata_edges_default(spark):
    """Reference default (no -compute_edges): border = dst nodata,
    interior identical to the replicate run (interior windows never
    touch a pad cell)."""
    t = byte20_tiles(spark)
    rep = materialize_full(slope(t, FSPEC), FSPEC)
    nod = materialize_full(slope(t, FSPEC, edges="nodata"), FSPEC)
    assert (nod[0, :] == -9999.0).all() and (nod[-1, :] == -9999.0).all()
    assert (nod[:, 0] == -9999.0).all() and (nod[:, -1] == -9999.0).all()
    np.testing.assert_array_equal(nod[1:-1, 1:-1], rep[1:-1, 1:-1])
    # hillshade uses dst nodata 0 (gdaldem_lib.cpp:3821)
    from gdal_spark.operators.focal import hillshade

    hs = materialize_full(hillshade(t, FSPEC, edges="nodata"), FSPEC)
    assert (hs[0, :] == 0.0).all() and (hs[:, -1] == 0.0).all()


def test_interpol_interior_unchanged(spark):
    """Only the 1-px border differs from the replicate default."""
    t = byte20_tiles(spark)
    rep = materialize_full(slope(t, FSPEC), FSPEC)
    itp = materialize_full(slope(t, FSPEC, edges="interpol"), FSPEC)
    np.testing.assert_array_equal(itp[1:-1, 1:-1], rep[1:-1, 1:-1])
