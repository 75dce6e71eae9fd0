"""nearblack — convert nearly-black (or nearly-white / near-color)
borders to the exact value, reference semantics bit-for-bit.

Reference: /root/reference/apps/nearblack_lib.cpp (GDALNearblack
"twopasses" algorithm):

  * top-down pass (:398-466): each scanline is read from the SOURCE,
    then ProcessLine L->R with vertical+horizontal checks, then
    ProcessLine R->L horizontal-only; the result is written out.
  * bottom-up pass (:471-535): re-reads the top-down OUTPUT from the
    bottom, fresh vertical counts, horizontal max-non-black forced 0
    (:646-647).
  * vertical check (:562-634): per-column CUMULATIVE non-black count
    (never reset, :620 commented-out reset); a column terminates once
    count > max_non_black; noise pixels with count still <= max are
    replaced too; a non-black pixel on the very first scanned row with
    max>0 terminates its column immediately (:651-657 analog at
    :611-617).
  * horizontal check (:639-741): scans iStart..iEnd EXCLUSIVE
    (`i != iEnd`, :653) — L->R never touches the last column, R->L
    never touches column 0; grey-area rule: a non-black pixel whose
    column count is <= max RESETS the run counter to that count
    (:695-698); when testing is off, a column whose count is 0
    re-enables it (:734-739) without replacing that pixel (it is
    already replaced by the vertical check).
  * a pixel is "near" iff ANY color matches within near_dist on ALL
    source bands (:578-601); the replacement value is 255 iff exactly
    one color is given and its first component is 255, else 0
    (:552-556); replacements zero the alpha band (:626-631, :727).

Distributed shape: the scans are separable per column (vertical state)
and per row (horizontal state), so the operator is FOUR strip
shuffles, the proximity.py pattern — groupBy(tx) column strips for the
top-down vertical, groupBy(ty) row strips for the top-down horizontal,
then the same two again for the bottom-up pass (which by construction
needs the materialized intermediate raster). The per-column count
state that the reference threads between its vertical and horizontal
checks travels as a band-0 uint8 sidecar tile (value capped at
max_non_black+1 — the only distinctions the horizontal check reads are
==0, <=max, >max). Shuffle volume per stage == raster bytes (+1 band
of sidecar); strip memory = tile_size x max(W, H) x (nbands + 2)
bytes per task. Inside a strip everything vectorizes across the
perpendicular axis: the vertical scan iterates rows with
width-vectors, the horizontal scan iterates columns with
height-vector state machines — O(cells) total, no per-pixel Python.
For rasters whose full line exceeds a strip task, the per-pixel state
is 2..max+2 values, so line segments compose associatively via
per-segment (state -> state) transition tables — same future-work
note as proximity.py's parabola-envelope merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.operators.raster import TILE_SCHEMA, RasterSpec

_COUNT_BAND = 0  # sidecar band id carrying panLastLineCounts


def _default_colors(white: bool, nbands: int) -> list[tuple[int, ...]]:
    v = 255 if white else 0
    return [tuple([v] * nbands)]


def _replace_value(colors) -> int:
    # nearblack_lib.cpp:552-556
    if len(colors) == 1 and len(colors[0]) >= 1 and colors[0][0] == 255:
        return 255
    return 0


def _nonblack(v: np.ndarray, colors, near: int) -> np.ndarray:
    """v: (nbands, n) uint8 slice -> (n,) bool, True where NO color
    matches within near on all bands (nearblack_lib.cpp:578-601)."""
    n = v.shape[1]
    nb = np.ones(n, dtype=bool)
    vi = v.astype(np.int32)
    for color in colors:
        off = np.zeros(n, dtype=bool)
        for b in range(v.shape[0]):
            off |= np.abs(vi[b] - int(color[b])) > near
        nb &= off
        if not nb.any():
            break
    return nb


def _vscan(
    arr: np.ndarray,
    alpha: np.ndarray | None,
    colors,
    near: int,
    max_nb: int,
    replace_value: int,
    bottom_up: bool,
) -> np.ndarray:
    """In-place vertical check over a (nbands, H, w) strip; returns the
    (H, w) uint8 count sidecar (state AFTER each row's update)."""
    nb_, H, w = arr.shape
    counts = np.zeros(w, dtype=np.int32)
    out_counts = np.empty((H, w), dtype=np.uint8)
    rows = range(H - 1, -1, -1) if bottom_up else range(H)
    # the scan writes only the row it is visiting, so the non-black
    # test over the whole strip can vectorize up front (one pass over
    # all pixels) instead of per row
    nbm = _nonblack(arr.reshape(nb_, H * w), colors, near).reshape(H, w)
    for edge_dist, r in enumerate(rows):
        act = counts <= max_nb
        nb = nbm[r]
        counts = counts + (act & nb)
        if max_nb > 0 and edge_dist == 0:
            # valid value on the very first scanned row terminates the
            # column outright (nearblack_lib.cpp:611-617)
            counts[act & nb] = max_nb + 1
        repl = act & (counts <= max_nb)
        if repl.any():
            arr[:, r, repl] = replace_value
            if alpha is not None:
                alpha[r, repl] = 0
        out_counts[r] = np.minimum(counts, max_nb + 1).astype(np.uint8)
    return out_counts


def _hscan(
    arr: np.ndarray,
    counts: np.ndarray,
    alpha: np.ndarray | None,
    colors,
    near: int,
    max_nb: int,
    replace_value: int,
    left_to_right: bool,
) -> None:
    """In-place horizontal check over a (nbands, h, W) strip, vector
    state across the h rows. counts: (h, W) uint8 sidecar. The scan
    covers iStart..iEnd EXCLUSIVE (`i != iEnd`, nearblack_lib.cpp:653)."""
    nb_, h, W = arr.shape
    if W <= 1:
        return
    xs = range(0, W - 1) if left_to_right else range(W - 1, 0, -1)
    istart = 0 if left_to_right else W - 1
    do_test = np.ones(h, dtype=bool)
    nnb = np.zeros(h, dtype=np.int32)
    # columns ahead of the cursor are never modified by the scan, so
    # the non-black test vectorizes over the whole strip up front
    nbm = _nonblack(arr.reshape(nb_, h * W), colors, near).reshape(h, W)
    for x in xs:
        nb = nbm[:, x]
        cz = counts[:, x].astype(np.int32)
        # grey-area rule (:695-698): a non-black pixel inherits the
        # column count when that count is still <= max, else the run
        # counter increments
        nnb_new = np.where(nb, np.where(cz <= max_nb, cz, nnb + 1), nnb)
        stop = nnb_new > max_nb
        if max_nb > 0 and x == istart:
            stop = stop | nb  # edge-column valid data (:708-713)
        repl = do_test & ~stop
        if repl.any():
            arr[:, repl, x] = replace_value
            if alpha is not None:
                alpha[repl, x] = 0
        re_enable = ~do_test & (cz == 0)  # :734-739
        nnb = np.where(do_test, nnb_new, np.where(re_enable, 0, nnb))
        do_test = np.asarray(np.where(do_test, ~stop, re_enable), dtype=bool)


def nearblack(
    tiles: DataFrame,
    spec: RasterSpec,
    white: bool = False,
    colors: list[tuple[int, ...]] | None = None,
    near: int = 15,
    max_non_black: int = 2,
    set_alpha: bool = False,
) -> DataFrame:
    """Distributed GDALNearblack over a uint8 tile table. Returns a
    dense tile table with bands 1..spec.nbands (borders replaced) plus,
    when set_alpha, band spec.nbands+1 = the alpha band (255 kept /
    0 trimmed). Defaults match the reference CLI (-near 15 -nb 2).

    Sparse inputs densify against spec.init first (absent tiles are
    init-valued, the repo-wide sparse-tile convention)."""
    if spec.dtype != "uint8":
        raise NotImplementedError("nearblack operates on Byte rasters (reference reads GDT_UInt8)")
    if not 0 <= max_non_black < 255:
        raise ValueError("max_non_black must be in [0, 255)")
    nbands = spec.nbands
    cols = colors if colors else _default_colors(white, nbands)
    if any(len(c) != nbands for c in cols):
        raise ValueError("each color must have one value per band")
    rep = _replace_value(cols)
    ts = spec.tile_size
    W, H = spec.width, spec.height
    nty, ntx = spec.ntiles_y, spec.ntiles_x
    init = int(spec.init)
    alpha_band = nbands + 1

    spark = tiles.sparkSession
    # densify at zero cost: strip assembly init-fills missing tiles,
    # so sparseness only matters when an ENTIRE strip has no tiles —
    # one null-payload seed row per tile-column guarantees every
    # groupBy(tx) group exists (no skeleton join: that would shuffle
    # the whole raster an extra time)
    seeds = spark.range(ntx).selectExpr(
        "cast(-1 as int) as band", "cast(0 as int) as ty", "cast(id as int) as tx",
        "cast(0 as int) as h", "cast(0 as int) as w",
        "cast(null as string) as dtype", "cast(null as binary) as payload",
    )
    dense = tiles.select("band", "ty", "tx", "h", "w", "dtype", "payload").unionByName(seeds)

    def _strip_cols(pdf: pd.DataFrame, want_alpha: bool, want_counts: bool, txx: int):
        """(nbands, H, w) strip + optional alpha/counts from tile rows."""
        w = min(ts, W - txx * ts)
        arr = np.full((nbands, H, w), init, dtype=np.uint8)
        alpha = np.full((H, w), 255, dtype=np.uint8) if want_alpha else None
        cnt = np.zeros((H, w), dtype=np.uint8) if want_counts else None
        for r in pdf.itertuples(index=False):
            if r.payload is None:
                continue
            y0 = int(r.ty) * ts
            t = np.frombuffer(r.payload, dtype=np.uint8).reshape(-1, w)
            b = int(r.band)
            if 1 <= b <= nbands:
                arr[b - 1, y0 : y0 + t.shape[0], :] = t
            elif b == alpha_band and want_alpha:
                alpha[y0 : y0 + t.shape[0], :] = t
            elif b == _COUNT_BAND and want_counts:
                cnt[y0 : y0 + t.shape[0], :] = t
        return arr, alpha, cnt

    def _strip_rows(pdf: pd.DataFrame, want_alpha: bool, want_counts: bool, tyy: int):
        h = min(ts, H - tyy * ts)
        arr = np.full((nbands, h, W), init, dtype=np.uint8)
        alpha = np.full((h, W), 255, dtype=np.uint8) if want_alpha else None
        cnt = np.zeros((h, W), dtype=np.uint8) if want_counts else None
        for r in pdf.itertuples(index=False):
            if r.payload is None:
                continue
            x0 = int(r.tx) * ts
            t = np.frombuffer(r.payload, dtype=np.uint8).reshape(h, -1)
            b = int(r.band)
            if 1 <= b <= nbands:
                arr[b - 1, :, x0 : x0 + t.shape[1]] = t
            elif b == alpha_band and want_alpha:
                alpha[:, x0 : x0 + t.shape[1]] = t
            elif b == _COUNT_BAND and want_counts:
                cnt[:, x0 : x0 + t.shape[1]] = t
        return arr, alpha, cnt

    def _emit_cols(txx, arr, alpha, cnt):
        w = arr.shape[2]
        rows = []
        for ty in range(nty):
            h = min(ts, H - ty * ts)
            sl = slice(ty * ts, ty * ts + h)
            for b in range(nbands):
                rows.append({"band": b + 1, "ty": ty, "tx": txx, "h": h, "w": w,
                             "dtype": "uint8", "payload": np.ascontiguousarray(arr[b, sl, :]).tobytes()})
            if alpha is not None:
                rows.append({"band": alpha_band, "ty": ty, "tx": txx, "h": h, "w": w,
                             "dtype": "uint8", "payload": np.ascontiguousarray(alpha[sl, :]).tobytes()})
            if cnt is not None:
                rows.append({"band": _COUNT_BAND, "ty": ty, "tx": txx, "h": h, "w": w,
                             "dtype": "uint8", "payload": np.ascontiguousarray(cnt[sl, :]).tobytes()})
        return pd.DataFrame(rows)

    def _emit_rows(tyy, arr, alpha, cnt):
        h = arr.shape[1]
        rows = []
        for tx in range(ntx):
            w = min(ts, W - tx * ts)
            sl = slice(tx * ts, tx * ts + w)
            for b in range(nbands):
                rows.append({"band": b + 1, "ty": tyy, "tx": tx, "h": h, "w": w,
                             "dtype": "uint8", "payload": np.ascontiguousarray(arr[b, :, sl]).tobytes()})
            if alpha is not None:
                rows.append({"band": alpha_band, "ty": tyy, "tx": tx, "h": h, "w": w,
                             "dtype": "uint8", "payload": np.ascontiguousarray(alpha[:, sl]).tobytes()})
            if cnt is not None:
                rows.append({"band": _COUNT_BAND, "ty": tyy, "tx": tx, "h": h, "w": w,
                             "dtype": "uint8", "payload": np.ascontiguousarray(cnt[:, sl]).tobytes()})
        return pd.DataFrame(rows)

    # stage A: top-down vertical (column strips, source values)
    def _a(key, pdf):
        txx = int(key[0])
        arr, alpha, _ = _strip_cols(pdf, set_alpha, False, txx)
        cnt = _vscan(arr, alpha, cols, near, max_non_black, rep, bottom_up=False)
        return _emit_cols(txx, arr, alpha, cnt)

    # stage B: top-down horizontal L->R then R->L (row strips)
    def _b(key, pdf):
        tyy = int(key[0])
        arr, alpha, cnt = _strip_rows(pdf, set_alpha, True, tyy)
        _hscan(arr, cnt, alpha, cols, near, max_non_black, rep, left_to_right=True)
        _hscan(arr, cnt, alpha, cols, near, max_non_black, rep, left_to_right=False)
        return _emit_rows(tyy, arr, alpha, None)

    # stage C: bottom-up vertical on the intermediate raster
    def _c(key, pdf):
        txx = int(key[0])
        arr, alpha, _ = _strip_cols(pdf, set_alpha, False, txx)
        cnt = _vscan(arr, alpha, cols, near, max_non_black, rep, bottom_up=True)
        return _emit_cols(txx, arr, alpha, cnt)

    # stage D: bottom-up horizontal, max-non-black forced 0 (:646-647)
    def _d(key, pdf):
        tyy = int(key[0])
        arr, alpha, cnt = _strip_rows(pdf, set_alpha, True, tyy)
        _hscan(arr, cnt, alpha, cols, near, 0, rep, left_to_right=True)
        _hscan(arr, cnt, alpha, cols, near, 0, rep, left_to_right=False)
        return _emit_rows(tyy, arr, alpha, None)

    s1 = dense.groupBy("tx").applyInPandas(_a, TILE_SCHEMA)
    s2 = s1.groupBy("ty").applyInPandas(_b, TILE_SCHEMA)
    s3 = s2.groupBy("tx").applyInPandas(_c, TILE_SCHEMA)
    return s3.groupBy("ty").applyInPandas(_d, TILE_SCHEMA)


# ---------------------------------------------------------------------------
# scalar replica (literal translation of nearblack_lib.cpp, test oracle)


def nearblack_scalar(
    arr: np.ndarray,
    white: bool = False,
    colors: list[tuple[int, ...]] | None = None,
    near: int = 15,
    max_non_black: int = 2,
    set_alpha: bool = False,
) -> tuple[np.ndarray, np.ndarray | None]:
    """(nbands, H, W) uint8 -> (out, alpha). Per-pixel loops, literal
    ProcessLine translation — the parity oracle for the distributed op."""
    nbands, H, W = arr.shape
    cols = colors if colors else _default_colors(white, nbands)
    rep = _replace_value(cols)
    out = arr.astype(np.int32).copy()
    alpha = np.full((H, W), 255, dtype=np.int32) if set_alpha else None

    def is_nb(line, i):
        for color in cols:
            off = False
            for b in range(nbands):
                if abs(int(color[b]) - int(line[b, i])) > near:
                    off = True
                    break
            if not off:
                return False
        return True

    def process_line(line, counts, istart, iend, max_nb, do_vert, bottom_up, line_from_edge, aline):
        if do_vert:
            n = max(istart + 1, iend + 1)
            for i in range(n):
                if counts[i] > max_nb:
                    continue
                nb = is_nb(line, i)
                if nb:
                    counts[i] += 1
                    if counts[i] > max_nb:
                        continue
                    if line_from_edge == 0 and max_nb > 0:
                        counts[i] = max_nb + 1
                        continue
                for b in range(nbands):
                    line[b, i] = rep
                if aline is not None:
                    aline[i] = 0
        # horizontal
        h_max = 0 if bottom_up else max_nb
        nnb = 0
        idir = 1 if istart < iend else -1
        do_test = True
        i = istart
        while i != iend:
            if do_test:
                nb = is_nb(line, i)
                if nb:
                    if counts[i] <= h_max:
                        nnb = counts[i]
                    else:
                        nnb += 1
                if nnb > h_max:
                    do_test = False
                    i += idir
                    continue
                if nb and h_max > 0 and i == istart:
                    do_test = False
                    i += idir
                    continue
                for b in range(nbands):
                    line[b, i] = rep
                if aline is not None:
                    aline[i] = 0
            elif counts[i] == 0:
                do_test = True
                nnb = 0
            i += idir
        return

    # top-down
    counts = np.zeros(W, dtype=np.int64)
    for r in range(H):
        line = out[:, r, :]
        aline = alpha[r] if alpha is not None else None
        process_line(line, counts, 0, W - 1, max_non_black, True, False, r, aline)
        process_line(line, counts, W - 1, 0, max_non_black, False, False, r, aline)
    # bottom-up
    counts[:] = 0
    for r in range(H - 1, -1, -1):
        line = out[:, r, :]
        aline = alpha[r] if alpha is not None else None
        process_line(line, counts, 0, W - 1, max_non_black, True, True, H - 1 - r, aline)
        process_line(line, counts, W - 1, 0, max_non_black, False, True, H - 1 - r, aline)
    return out.astype(np.uint8), None if alpha is None else alpha.astype(np.uint8)


def nearblack_floodfill(
    tiles: DataFrame,
    spec: RasterSpec,
    white: bool = False,
    colors: list[tuple[int, ...]] | None = None,
    near: int = 15,
    set_alpha: bool = False,
) -> DataFrame:
    """nearblack -alg floodfill (apps/nearblack_lib_floodfill.cpp):
    replace every near-color pixel 4-connected to the image border
    through near-color pixels (Fill seeds = all border pixels,
    Process :423-438; MustSet = the same any-color-within-near test
    :60-95; -nb is not consulted by this algorithm). The reference
    runs a scanline flood with a backtrack window; connectivity is the
    semantics, so the distributed form is the polygonize/sieve
    2-phase: per-tile connected-component labeling, seam-strip rows
    exchanged by (seam, position) to pair adjacent tiles' local labels
    into a component-graph edge list, min-label propagation over that
    graph (operators/graph.py connected_components — O(diameter)
    rounds over labels, never pixels) with a virtual node 0 linked to
    every border-touching label, then a fill-set join and one rewrite
    pass. NOTHING collects to the driver at any raster size — the r4
    driver union-find (state O(total tile perimeter)) is gone.
    Deterministic local labeling makes the second pass recompute
    identical labels instead of shipping label rasters."""
    if spec.dtype != "uint8":
        raise NotImplementedError("nearblack operates on Byte rasters")
    from gdal_spark.operators.polygonize import label_components

    nbands = spec.nbands
    cols = colors if colors else _default_colors(white, nbands)
    if any(len(c) != nbands for c in cols):
        raise ValueError("each color must have one value per band")
    rep = _replace_value(cols)
    ts = spec.tile_size
    W, H = spec.width, spec.height
    nty, ntx = spec.ntiles_y, spec.ntiles_x
    init = int(spec.init)
    alpha_band = nbands + 1
    spark = tiles.sparkSession

    seeds = spark.range(nty * ntx).selectExpr(
        "cast(-1 as int) as band",
        f"cast(id div {ntx} as int) as ty", f"cast(id % {ntx} as int) as tx",
        "cast(0 as int) as h", "cast(0 as int) as w",
        "cast(null as string) as dtype", "cast(null as binary) as payload",
    )
    dense = tiles.select("band", "ty", "tx", "h", "w", "dtype", "payload").unionByName(seeds)

    def _assemble(key, pdf):
        ty, tx = int(key[0]), int(key[1])
        h = min(ts, H - ty * ts)
        w = min(ts, W - tx * ts)
        arr = np.full((nbands, h, w), init, dtype=np.uint8)
        for r in pdf.itertuples(index=False):
            if r.payload is None:
                continue
            b = int(r.band)
            if 1 <= b <= nbands:
                arr[b - 1] = np.frombuffer(r.payload, dtype=np.uint8).reshape(h, w)
        return ty, tx, h, w, arr

    def _near_and_labels(arr):
        nbm = _nonblack(arr.reshape(arr.shape[0], -1), cols, near).reshape(arr.shape[1:])
        nearm = ~nbm
        labels = label_components(np.zeros_like(nearm, dtype=np.int64), nearm, connect=4)
        return nearm, labels

    # node id: (tile, local label) packed into one int64 — labels from
    # label_components are 1..(pixels in tile), so a ts*ts+1 stride
    # keeps ids distinct and >= 1; id 0 is the virtual BORDER node
    stride = ts * ts + 1

    # phase 1: per-tile seam strips + border labels as plain rows.
    # Each tile emits every boundary strip keyed by the SEAM it sits
    # on ((axis, sy, sx) = the seam between (sy,sx) and its right/down
    # neighbor) plus a side bit — adjacent tiles' strips meet in one
    # groupBy, no driver involvement
    def _strips(key, pdf):
        ty, tx, h, w, arr = _assemble(key, pdf)
        _, labels = _near_and_labels(arr)
        base = (ty * ntx + tx) * stride
        out = {"axis": [], "sy": [], "sx": [], "pos": [], "side": [], "nid": []}

        def emit(axis, sy, sx, side, strip):
            pos = np.flatnonzero(strip > 0)
            if not pos.size:
                return
            out["axis"].append(np.full(pos.size, axis, dtype=np.int32))
            out["sy"].append(np.full(pos.size, sy, dtype=np.int32))
            out["sx"].append(np.full(pos.size, sx, dtype=np.int32))
            out["pos"].append(pos.astype(np.int32))
            out["side"].append(np.full(pos.size, side, dtype=np.int32))
            out["nid"].append(base + strip[pos].astype(np.int64))

        t = labels[0, :].astype(np.int64)
        b = labels[h - 1, :].astype(np.int64)
        lft = labels[:, 0].astype(np.int64)
        r = labels[:, w - 1].astype(np.int64)
        # vertical seams (axis 0): between (ty, sx) and (ty, sx+1)
        if tx > 0:
            emit(0, ty, tx - 1, 1, lft)
        if tx < ntx - 1:
            emit(0, ty, tx, 0, r)
        # horizontal seams (axis 1): between (sy, tx) and (sy+1, tx)
        if ty > 0:
            emit(1, ty - 1, tx, 1, t)
        if ty < nty - 1:
            emit(1, ty, tx, 0, b)
        # raster-border labels: axis 2 rows pair with the virtual node
        border = np.zeros(0, dtype=np.int64)
        if ty == 0:
            border = np.concatenate([border, t])
        if ty == nty - 1:
            border = np.concatenate([border, b])
        if tx == 0:
            border = np.concatenate([border, lft])
        if tx == ntx - 1:
            border = np.concatenate([border, r])
        border = np.unique(border[border > 0])
        if border.size:
            out["axis"].append(np.full(border.size, 2, dtype=np.int32))
            out["sy"].append(np.full(border.size, ty, dtype=np.int32))
            out["sx"].append(np.full(border.size, tx, dtype=np.int32))
            out["pos"].append(np.arange(border.size, dtype=np.int32))
            out["side"].append(np.zeros(border.size, dtype=np.int32))
            out["nid"].append(base + border)
        if not out["nid"]:
            return pd.DataFrame(columns=["axis", "sy", "sx", "pos", "side", "nid"])
        return pd.DataFrame({k: np.concatenate(v) for k, v in out.items()})

    strips = dense.groupBy("ty", "tx").applyInPandas(
        _strips, "axis int, sy int, sx int, pos int, side int, nid long"
    )

    # seam pairing: both sides of a seam meet on (axis, sy, sx, pos);
    # a pair exists only where BOTH positions are near-color. Border
    # rows (axis 2) pair with the virtual node 0.
    from gdal_spark.operators.graph import connected_components

    seam = strips.filter(F.col("axis") < 2).groupBy("axis", "sy", "sx", "pos").agg(
        F.max(F.when(F.col("side") == 0, F.col("nid"))).alias("src"),
        F.max(F.when(F.col("side") == 1, F.col("nid"))).alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull()).select("src", "dst")
    border_edges = strips.filter(F.col("axis") == 2).select(
        F.lit(0).cast("long").alias("src"), F.col("nid").alias("dst")
    )
    edges = seam.unionByName(border_edges).distinct()

    # min-label propagation: the border component's min id IS 0, so
    # fill nodes are exactly component == 0 (minus the virtual node)
    comp = connected_components(edges)
    fills = (
        comp.filter((F.col("component") == 0) & (F.col("node") > 0))
        .select(
            # integer div/mod, not float division: node ids pass 2^53
            # on large rasters and a double quotient would mis-decode
            F.expr(f"node div {stride}").alias("_tid"),
            F.expr(f"node % {stride}").alias("lab"),
        )
        .select(
            F.expr(f"_tid div {ntx}").cast("int").alias("ty"),
            F.expr(f"_tid % {ntx}").cast("int").alias("tx"),
            "lab",
        )
    )

    # phase 2: rewrite (labels recomputed deterministically); the
    # fill set arrives per tile through the cogroup, not a broadcast
    def _rewrite(key, pdf, fpdf):
        ty, tx, h, w, arr = _assemble(key, pdf)
        _, labels = _near_and_labels(arr)
        fill_labs = np.unique(fpdf["lab"].to_numpy(np.int64)) if len(fpdf) else None
        m = (
            np.isin(labels, fill_labs)
            if fill_labs is not None and fill_labs.size
            else np.zeros((h, w), dtype=bool)
        )
        arr[:, m] = rep
        rows = []
        for b in range(nbands):
            rows.append({"band": b + 1, "ty": ty, "tx": tx, "h": h, "w": w,
                         "dtype": "uint8", "payload": arr[b].tobytes()})
        if set_alpha:
            alpha = np.where(m, 0, 255).astype(np.uint8)
            rows.append({"band": alpha_band, "ty": ty, "tx": tx, "h": h, "w": w,
                         "dtype": "uint8", "payload": alpha.tobytes()})
        return pd.DataFrame(rows)

    return (
        dense.groupBy("ty", "tx")
        .cogroup(fills.groupBy("ty", "tx"))
        .applyInPandas(_rewrite, TILE_SCHEMA)
    )
