"""Proximity raster (alg/gdalproximity.cpp GDALComputeProximity):
per-pixel euclidean distance to the nearest TARGET pixel (targets =
pixels whose value is in target_values; default any non-zero).

The reference runs scanline passes over the whole raster in one
process. The distributed design exploits that the exact euclidean
distance transform is SEPARABLE (Felzenszwalb-Huttenlocher): a 1D
squared-distance transform along every row, then a 1D transform along
every column of the row-pass result, yields the exact 2D EDT.

Each 1D pass needs whole lines — which in a tile table is just a
shuffle key choice:

  phase A: groupBy(ty)  -> assemble full-width row strips (ts x W),
           run the 1D transform along x;
  phase B: groupBy(tx)  -> assemble full-height column strips
           (H x ts) of phase-A output, run the 1D transform along y;
           re-emit tiles.

Two shuffles, zero iteration, exact. Strip memory is
tile_size x max(W, H) x 8B per task (8 MB at 4096^2); for rasters
whose full line exceeds a task, lines split into segments whose
parabola lower-envelopes merge associatively (future work, noted).

Options follow the reference: DISTUNITS=PIXEL output, MAXDIST ->
NODATA replacement (gdalproximity.cpp options).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from gdal_spark.operators.raster import RasterSpec, TILE_SCHEMA, copy_word

_INF = 1e30


def _edt_1d(f: np.ndarray) -> np.ndarray:
    """Felzenszwalb-Huttenlocher 1D squared distance transform applied
    to every row of f (vectorized per row loop; O(n) per row)."""
    n = f.shape[-1]
    out = np.empty_like(f)
    for row in range(f.shape[0]):
        d = f[row]
        v = np.zeros(n, dtype=np.int64)
        z = np.empty(n + 1)
        k = 0
        started = d[0] < _INF
        first = 0
        if not started:
            # find first finite parabola
            fin = np.flatnonzero(d < _INF)
            if fin.size == 0:
                out[row] = _INF
                continue
            first = int(fin[0])
        v[0] = first
        z[0] = -_INF
        z[1] = _INF
        for q in range(first + 1, n):
            if d[q] >= _INF:
                continue
            while True:
                p = v[k]
                s = ((d[q] + q * q) - (d[p] + p * p)) / (2.0 * q - 2.0 * p)
                if s <= z[k]:
                    k -= 1
                    if k < 0:
                        k = 0
                        v[0] = q
                        z[0] = -_INF
                        z[1] = _INF
                        break
                else:
                    k += 1
                    v[k] = q
                    z[k] = s
                    z[k + 1] = _INF
                    break
        k2 = 0
        for q in range(n):
            while z[k2 + 1] < q:
                k2 += 1
            p = v[k2]
            out[row, q] = (q - p) * (q - p) + d[p]
    return out


def edt2(seed: np.ndarray) -> np.ndarray:
    """Exact 2D squared EDT (rows pass then columns pass)."""
    a = _edt_1d(seed)
    return np.ascontiguousarray(_edt_1d(np.ascontiguousarray(a.T)).T)


def proximity(
    tiles: DataFrame,
    spec: RasterSpec,
    target_values: list[float] | None = None,
    maxdist: float | None = None,
    nodata: float = 65535.0,
    band: int = 1,
    out_dtype: str = "float64",
    squared: bool = False,
) -> DataFrame:
    """Distance in pixels to the nearest target. Returns a tile table.
    squared=True emits exact integer-valued squared distances (useful
    for bit-exact cross-engine checks; maxdist still compares the
    euclidean distance)."""
    ts = spec.tile_size
    W, H = spec.width, spec.height
    tv = target_values

    # phase A: row strips
    def _xpass(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tyy = int(key[0])
        sh = min(ts, H - tyy * ts)
        strip = np.full((sh, W), _INF)
        for r in pdf.itertuples(index=False):
            if r.band != band:
                continue
            t = np.frombuffer(r.payload, dtype=r.dtype).reshape(r.h, r.w)
            is_target = np.isin(t, tv) if tv is not None else (t != 0)
            strip[:, r.tx * ts : r.tx * ts + r.w] = np.where(is_target, 0.0, _INF)
        dx2 = _edt_1d(strip)
        rows = []
        for tx in range(spec.ntiles_x):
            w = min(ts, W - tx * ts)
            rows.append(
                {"band": 1, "ty": tyy, "tx": tx, "h": sh, "w": w,
                 "dtype": "float64", "payload": np.ascontiguousarray(dx2[:, tx * ts : tx * ts + w]).tobytes()}
            )
        return pd.DataFrame(rows)

    rowpass = tiles.groupBy("ty").applyInPandas(_xpass, TILE_SCHEMA)

    # phase B: column strips of the row-pass result
    def _ypass(key, pdf: pd.DataFrame) -> pd.DataFrame:
        txx = int(key[0])
        sw = min(ts, W - txx * ts)
        strip = np.full((H, sw), _INF)
        for r in pdf.itertuples(index=False):
            strip[r.ty * ts : r.ty * ts + r.h, :] = np.frombuffer(
                r.payload, dtype=np.float64
            ).reshape(r.h, r.w)
        d2 = _edt_1d(np.ascontiguousarray(strip.T)).T
        d = np.sqrt(np.where(d2 >= _INF, np.inf, d2))
        if maxdist is not None:
            d = np.where(d > maxdist, nodata, d)
        if squared:
            d = np.where(np.isinf(d) | (d == nodata), nodata, np.where(d2 >= _INF, nodata, d2))
        d = np.where(np.isinf(d), nodata, d)
        rows = []
        for ty in range(spec.ntiles_y):
            h = min(ts, H - ty * ts)
            rows.append(
                {"band": 1, "ty": ty, "tx": txx, "h": h, "w": sw,
                 "dtype": out_dtype,
                 "payload": copy_word(np.ascontiguousarray(d[ty * ts : ty * ts + h, :]), out_dtype).tobytes()}
            )
        return pd.DataFrame(rows)

    return rowpass.groupBy("tx").applyInPandas(_ypass, TILE_SCHEMA)
