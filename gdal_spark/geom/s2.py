"""True S2 cell ids — cube-face quadtree + Hilbert curve, 64-bit.

The north star names "vectorized H3/S2 cell encoding ... explicit
repartitioning by cell prefix".  `operators/cells.py` provides the
planar-grid analog used by the join/tile pipelines; this module is the
real spherical index: the canonical S2 construction (public algorithm,
s2geometry s2coords.h / s2cell_id.cc semantics) — project a unit
vector onto one of 6 cube faces, quadratic ST transform, discretize to
a 30-level (i, j) quadtree, and order cells by a face-local Hilbert
curve so that the 64-bit id's PREFIX structure gives:

  * containment tests as one range comparison (range_min <= id <=
    range_max) — a Catalyst-pushable predicate,
  * "repartition by cell prefix" as `parent(id, coarse_level)` — pure
    bit arithmetic (shiftright/shiftleft/or), zero Python,
  * Hilbert locality: consecutive ids are spatially adjacent, so
    range scans over an id-sorted/bucketed table touch contiguous
    geography (the same property FlatGeobuf exploits — geom/rtree.py).

Everything here is vectorized numpy over Arrow batches (no per-row
Python) per the north star's UDF rule.  The ST quadratic and the
Hilbert automaton use only correctly-rounded IEEE ops (+ - * / sqrt,
floor), so a SQL replica computes bit-identical ids — the driver
oracle `s2_cells` replays the full 30-level encode in DuckDB as a
recursive CTE and hash-matches the engine output.

Cell id layout (uint64, stored as signed int64 in Spark/Parquet —
faces 4 and 5 wrap negative, all helpers are bitwise-safe):

    [3 bits face][2*level bits Hilbert position][1][000...0]

The trailing set bit marks the level: level = 30 - (trailing_zeros/2).
Level-0 ids for faces 0..5 are 0x1000000000000000 * {1,3,5,7,9,b}
(tokens "1","3","5","7","9","b") — pinned in tests/test_s2.py.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_MAX_IJ = (1 << MAX_LEVEL) - 1

# Hilbert automaton (canonical S2 tables).  Orientation bits:
# swap = 1, invert = 2.  kIJtoPos[orientation][2*i_bit + j_bit] -> pos.
_IJ_TO_POS = np.array(
    [
        [0, 1, 3, 2],  # canonical
        [0, 3, 1, 2],  # axes swapped
        [2, 3, 1, 0],  # bits inverted
        [2, 1, 3, 0],  # swapped & inverted
    ],
    dtype=np.int64,
)
# kPosToIJ[orientation][pos] -> 2*i_bit + j_bit  (inverse of the above)
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],
        [0, 2, 3, 1],
        [3, 2, 0, 1],
        [3, 1, 0, 2],
    ],
    dtype=np.int64,
)
# orientation ^= kPosToOrientation[pos] after each level
_POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.int64)


# ---------------------------------------------------------------------------
# face / ST projection


def xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Largest-abs-component face selection + per-face (u, v).

    Tie-breaking is the exact comparison cascade the SQL oracle uses:
    |x| >= |y| AND |x| >= |z| -> x-face, else |y| >= |z| -> y-face,
    else z-face."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    fx = (ax >= ay) & (ax >= az)
    fy = ~fx & (ay >= az)
    fz = ~fx & ~fy
    face = np.where(fx, np.where(x >= 0, 0, 3), np.where(fy, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)))
    # canonical per-face UV table (s2coords.h ValidFaceXYZtoUV):
    #   0 (+x): u =  y/x, v =  z/x      3 (-x): u =  z/x, v =  y/x
    #   1 (+y): u = -x/y, v =  z/y      4 (-y): u =  z/y, v = -x/y
    #   2 (+z): u = -x/z, v = -y/z      5 (-z): u = -y/z, v = -x/z
    with np.errstate(divide="ignore", invalid="ignore"):
        conds = [face == f for f in range(6)]
        u = np.select(conds, [y / x, -(x / y), -(x / z), z / x, z / y, -(y / z)])
        v = np.select(conds, [z / x, z / y, -(y / z), y / x, -(x / y), -(x / z)])
    return face.astype(np.int64), u, v


def face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Inverse of xyz_to_face_uv (unnormalized)."""
    face = np.asarray(face)
    one = np.ones_like(np.asarray(u, dtype=np.float64))
    xs = [one, -u, -u, -one, v, v]
    ys = [u, one, -v, -v, -one, u]
    zs = [v, v, one, -u, -u, -one]
    x = np.select([face == f for f in range(6)], xs)
    y = np.select([face == f for f in range(6)], ys)
    z = np.select([face == f for f in range(6)], zs)
    return x, y, z


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic UV->ST (the s2 default projection): near-equal-area,
    closed form, only +-*/sqrt — bit-replayable in SQL."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):  # np.where evaluates the unused branch
        return np.where(u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def st_to_uv(s: np.ndarray) -> np.ndarray:
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def st_to_ij(s: np.ndarray) -> np.ndarray:
    i = np.floor(np.asarray(s, dtype=np.float64) * float(1 << MAX_LEVEL))
    # NaN (zero/NaN input vector) -> cell 0 of face 0 deterministically
    # instead of an undefined float->int cast crashing the executor
    i = np.where(np.isnan(i), 0.0, i)
    return np.clip(i, 0, _MAX_IJ).astype(np.int64)


# ---------------------------------------------------------------------------
# Hilbert encode / decode


def from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int = MAX_LEVEL) -> np.ndarray:
    """Vectorized FromFaceIJ: 30 numpy passes over the batch (no
    per-row Python).  Returns int64 (two's-complement view of the
    uint64 cell id) at `level`."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    orient = face & 1
    pos = np.zeros(face.shape, dtype=np.uint64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p.astype(np.uint64)
        orient = orient ^ _POS_TO_ORIENT[p]
    cid = (face.astype(np.uint64) << np.uint64(61)) | (pos << np.uint64(1)) | np.uint64(1)
    out = cid.view(np.int64)
    if level < MAX_LEVEL:
        out = parent(out, level)
    return out


def to_face_ij(cell: np.ndarray):
    """Inverse automaton: leaf-aligned (face, i, j) of the cell's
    min-corner leaf, plus the cell's level."""
    u = np.asarray(cell, dtype=np.int64).view(np.uint64)
    lvl = level_of(cell)
    face = (u >> np.uint64(61)).astype(np.int64)
    pos = (u >> np.uint64(1)) & np.uint64((1 << 60) - 1)
    orient = face & 1
    i = np.zeros(face.shape, dtype=np.int64)
    j = np.zeros(face.shape, dtype=np.int64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        active = lvl > (MAX_LEVEL - 1 - k)
        p = ((pos >> np.uint64(2 * k)) & np.uint64(3)).astype(np.int64)
        ij = _POS_TO_IJ[orient, p]
        i = np.where(active, i | ((ij >> 1) << k), i)
        j = np.where(active, j | ((ij & 1) << k), j)
        orient = np.where(active, orient ^ _POS_TO_ORIENT[p], orient)
    return face, i, j, lvl


def level_of(cell: np.ndarray) -> np.ndarray:
    """level = 30 - trailing_zero_pairs(id)."""
    u = np.asarray(cell, dtype=np.int64).view(np.uint64)
    lsb = u & (~u + np.uint64(1))
    # log2 of a power of two via float is exact up to 2^52; lsb <= 2^60
    shift = np.log2(lsb.astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - (shift >> 1)


def lsb_for_level(level: int) -> int:
    return 1 << (2 * (MAX_LEVEL - level))


def parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at `level` — pure bit arithmetic, mirrors the Catalyst
    helper s2_parent_col (shiftright/shiftleft keep two's-complement
    semantics identical for the face-4/5 negative ids)."""
    nbits = 2 * (MAX_LEVEL - level)
    c = np.asarray(cell, dtype=np.int64)
    return ((c >> nbits) << nbits) | np.int64(lsb_for_level(level))


def range_min(cell: np.ndarray) -> np.ndarray:
    c = np.asarray(cell, dtype=np.int64)
    lsb = c & (~c + np.int64(1))
    return c - (lsb - np.int64(1))


def range_max(cell: np.ndarray) -> np.ndarray:
    c = np.asarray(cell, dtype=np.int64)
    lsb = c & (~c + np.int64(1))
    return c + (lsb - np.int64(1))


def contains(ancestor: np.ndarray, descendant: np.ndarray) -> np.ndarray:
    """Unsigned range containment on signed-stored ids: flip the sign
    bit to restore unsigned order (faces 4/5 are negative int64)."""
    flip = np.int64(-9223372036854775808)  # sign bit (int64 min)
    d = np.asarray(descendant, dtype=np.int64) ^ flip
    amin = np.asarray(range_min(ancestor), dtype=np.int64) ^ flip
    amax = np.asarray(range_max(ancestor), dtype=np.int64) ^ flip
    return (amin <= d) & (d <= amax)


# ---------------------------------------------------------------------------
# end-to-end encoders


def cell_from_xyz(x, y, z, level: int = MAX_LEVEL) -> np.ndarray:
    """(x, y, z) need not be normalized — face/UV use ratios only."""
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    return from_face_ij(face, i, j, level)


def cell_from_lonlat(lon_deg, lat_deg, level: int = MAX_LEVEL) -> np.ndarray:
    """Geodetic entry point (numpy trig; tested by invariants — the
    bit-exact cross-engine oracle path is cell_from_xyz over rational
    vectors, since libm trig is not reproducible across engines)."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    cl = np.cos(lat)
    return cell_from_xyz(cl * np.cos(lon), cl * np.sin(lon), np.sin(lat), level)


def cell_center_xyz(cell: np.ndarray):
    """Unit-sphere center of the cell (normalized)."""
    face, i, j, lvl = to_face_ij(cell)
    size = np.int64(1) << (MAX_LEVEL - lvl)
    # center of the cell's ij square, in ST
    s = (i + size * 0.5) / float(1 << MAX_LEVEL)
    t = (j + size * 0.5) / float(1 << MAX_LEVEL)
    x, y, z = face_uv_to_xyz(face, st_to_uv(s), st_to_uv(t))
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def token(cell: np.ndarray) -> np.ndarray:
    """Canonical S2 token: 16-digit lowercase hex of the uint64 id
    with trailing zeros stripped."""
    u = np.asarray(cell, dtype=np.int64).view(np.uint64)
    flat = np.atleast_1d(u)
    out = np.array([format(int(c), "016x").rstrip("0") or "0" for c in flat], dtype=object)
    return out if u.shape else out[0]


# ---------------------------------------------------------------------------
# region covering (driver-side planning; output feeds Catalyst BETWEENs)

# conservative bound on the angular circumradius of a level-L cell,
# i.e. max angle from cell_center_xyz (normalized ST-square center) to
# any corner.  Measured empirically over 40k random cells per level
# 0..15: the ratio center-to-corner / 2^-L converges to 1.2193 —
# numerically identical to s2geometry's kMaxDiag deriv for the
# quadratic projection (the ST-center is NOT angularly centered, so
# the farthest corner sits a full kMaxDiag away, not kMaxDiag/2;
# halving this bound to ~0.61*2^-L was tried and breaks the superset
# guarantee in test_s2).  2.5/2 = 1.25*2^-L keeps ~2.5% margin.
_MAX_DIAG = 2.5


def _cell_circumradius(level: int) -> float:
    return _MAX_DIAG * (0.5 ** level) * 0.5


def _children(cell: int) -> list[int]:
    lvl = int(level_of(np.int64(cell)))
    lsb = lsb_for_level(lvl)
    clsb = lsb >> 2
    base = cell - lsb
    return [base + (2 * k + 1) * clsb for k in range(4)]


def cover_cap(axis, angle_rad: float, max_cells: int = 64, max_level: int = MAX_LEVEL):
    """Cover a spherical cap (axis unit vector, opening angle) with at
    most `max_cells` cells at mixed levels — a SUPERSET guarantee
    (every point of the cap lies in some emitted cell; conservative
    center-distance + circumradius tests, no false negatives).

    This is driver-side planning, like broadcasting the zone R-tree:
    the region is one query geometry, the output is a handful of id
    ranges that `cover_ranges`/`filter_expr` turn into Catalyst
    BETWEENs — at 10^12 rows a region probe is parquet row-group
    skipping over a cell-prefix-partitioned table, never a shuffle."""
    ax = np.asarray(axis, dtype=np.float64)
    ax = ax / np.sqrt((ax * ax).sum())
    angle_rad = float(angle_rad)

    def dist_to(cell: int) -> float:
        x, y, z = cell_center_xyz(np.int64(cell))
        d = float(ax[0]) * float(x) + float(ax[1]) * float(y) + float(ax[2]) * float(z)
        return float(np.arccos(np.clip(d, -1.0, 1.0)))

    def _signed(c: int) -> int:
        return c - (1 << 64) if c >= (1 << 63) else c

    faces = [_signed((2 * f + 1) << 60) for f in range(6)]
    work: list[int] = []
    out: list[int] = []
    for c in faces:
        d = dist_to(c)
        if d <= angle_rad + _cell_circumradius(0):
            work.append(c)
    # breadth-first refinement: all cells at level L are decided before
    # any at L+1, so the budget spreads evenly instead of one branch
    # refining to max_level while others stay coarse
    while work:
        cell = work.pop(0)
        lvl = int(level_of(np.int64(cell)))
        d = dist_to(cell)
        rad = _cell_circumradius(lvl)
        if d + rad <= angle_rad:
            out.append(cell)  # fully inside: emit as-is
            continue
        if d > angle_rad + rad:
            continue  # provably disjoint
        if lvl >= max_level or len(out) + len(work) + 4 > max_cells:
            out.append(cell)  # budget/depth reached: keep the partial cell
            continue
        work.extend(_children(cell))
    return sorted(out, key=lambda c: int(range_min(np.int64(c))))


def cover_ranges(cells: list[int]) -> list[tuple[int, int]]:
    """Merge a covering into disjoint, sorted [range_min, range_max]
    leaf-id intervals (adjacent/overlapping cells coalesce)."""
    iv = sorted(
        (int(range_min(np.int64(c))), int(range_max(np.int64(c)))) for c in cells
    )
    merged: list[list[int]] = []
    for lo, hi in iv:
        if merged and lo <= merged[-1][1] + 2:  # leaf ids step by 2
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    return [(lo, hi) for lo, hi in merged]
