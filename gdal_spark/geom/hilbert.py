"""Vectorized Hilbert curve codes (numpy uint32).

Behavior-compatible with GDALHilbertCode
(/root/reference/alg/hilbert.cpp:19-91), which is the public-domain
bit-twiddled Hilbert index from github.com/rawrunprotected/
hilbert_curves (16 bits per axis). The same ordering backs the
reference's FlatGeobuf packed R-tree
(ogr/ogrsf_frmts/flatgeobuf/packedrtree.h:120) and
`gdal vector sort --by hilbert` (apps/gdalalg_vector_sort.cpp:40) —
and here, our cell-prefix repartitioning: nearby cells get nearby
codes, so range-partitioning by code co-locates spatial neighbors.

Implemented from the published algorithm in numpy; matches the
reference's scalar outputs (tests/test_hilbert.py).
"""

from __future__ import annotations

import numpy as np

# Reference reserves the max value for empty/null (hilbert.cpp:17).
HILBERT_MAX = (1 << 16) - 2


def hilbert_code_xy(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Hilbert d-index of 16-bit cell coords; vectorized uint32."""
    x = np.asarray(x, dtype=np.uint32)
    y = np.asarray(y, dtype=np.uint32)
    M = np.uint32(0xFFFF)

    a = x ^ y
    b = M ^ a
    c = M ^ (x | y)
    d = x & (y ^ M)

    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d

    a, b, c, d = A, B, C, D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C = c ^ ((a & (c >> 2)) ^ (b & (d >> 2)))
    D = d ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))

    a, b, c, d = A, B, C, D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C = c ^ ((a & (c >> 4)) ^ (b & (d >> 4)))
    D = d ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))

    a, b, c, d = A, B, C, D
    C = C ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = D ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))

    a = C ^ (C >> 1)
    b = D ^ (D >> 1)

    i0 = x ^ y
    i1 = b | (M ^ (i0 | a))

    def interleave(v: np.ndarray) -> np.ndarray:
        v = (v | (v << 8)) & np.uint32(0x00FF00FF)
        v = (v | (v << 4)) & np.uint32(0x0F0F0F0F)
        v = (v | (v << 2)) & np.uint32(0x33333333)
        v = (v | (v << 1)) & np.uint32(0x55555555)
        return v

    return (interleave(i1) << 1) | interleave(i0)


def hilbert_code(
    x: np.ndarray,
    y: np.ndarray,
    minx: float,
    miny: float,
    maxx: float,
    maxy: float,
) -> np.ndarray:
    """Hilbert code of real coordinates over a domain envelope.

    Matches GDALHilbertCode(env, x, y) (hilbert.cpp:80-91): each axis
    scaled to [0, HILBERT_MAX] with round-half-away (C++ std::round);
    degenerate axis -> 0.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    w = maxx - minx
    h = maxy - miny
    # np.round is half-to-even; C++ std::round is half-away-from-zero.
    # values are non-negative here, so floor(v + 0.5) == std::round.
    xi = np.zeros(x.shape, dtype=np.uint32)
    yi = np.zeros(y.shape, dtype=np.uint32)
    if w != 0.0:
        xi = np.floor(HILBERT_MAX * (x - minx) / w + 0.5).astype(np.uint32)
    if h != 0.0:
        yi = np.floor(HILBERT_MAX * (y - miny) / h + 0.5).astype(np.uint32)
    return hilbert_code_xy(xi, yi)
