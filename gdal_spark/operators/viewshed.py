"""Viewshed: per-cell visibility from one observer over a DEM.

Semantics: cell (x, y) is visible iff GDALIsLineOfSightVisible
(alg/los.cpp — the exact Bresenham walk + distance-ratio z lerp) holds
between the observer point and the target point (DEM[y,x] +
target_height). This is the classic "R3" exhaustive definition; the
reference's GDALViewshedGenerate (alg/viewshed/viewshed.cpp) uses
Wang et al. reference planes, an O(n) approximation whose edge cells
can differ slightly — we keep the exact per-cell LOS definition and
say so.

Execution: the Bresenham walk has a closed form (verified against the
scalar loop in tests): for dx >= dy, at the i-th x step
    y = yA + incy * floor((2*dy*i + dx) / (2*dx))
(steep case symmetric), so a whole CHUNK of targets evaluates as one
(targets x path-steps) numpy broadcast — gather DEM along every path,
one comparison per cell, no per-pixel Python. The arithmetic
(sqrt(dist2/denom) ratio, za + r*(zb-za) < terrain) is expression-for-
expression the scalar loop's, so results are bit-identical to the R3
definition (and to the SQL oracle that re-walks the same recurrence).

Distributed shape: the DEM broadcasts (one observer's viewshed needs
the full terrain between observer and every target — inherent to the
problem); each TILE of target cells is one task running the chunked
numpy kernel. Total work is O(cells x ray length) — the R3 cost — but
fully vectorized; a 1024^2 DEM completes in seconds on local[32].

Cumulative mode (alg/viewshed/cumulative.cpp): observers on a regular
grid, output = per-cell count of observers that see it —
embarrassingly parallel over (observer x tile), then one groupBy(tile)
sum of the masks.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from gdal_spark.operators.raster import RasterSpec, TILE_SCHEMA


def _los_visible(dem: np.ndarray, xa: int, ya: int, za: float, xb: int, yb: int, zb: float) -> bool:
    """Scalar GDALIsLineOfSightVisible core (los.cpp Bresenham2D +
    GetZValueFromXY), endpoints included. Kept as the parity reference
    for the vectorized kernel below."""
    h, w = dem.shape
    if za < dem[ya, xa] or zb < dem[yb, xb]:
        return False
    if (xa, ya) == (xb, yb):
        return True
    denom = float((xb - xa) ** 2 + (yb - ya) ** 2)
    dx, incx = abs(xb - xa), (1 if xb >= xa else -1)
    dy, incy = abs(yb - ya), (1 if yb >= ya else -1)
    x, y = xa, ya
    if dx >= dy:
        DY, DX = dy * 2, dx * 2
        bal = DY - dx
        while True:
            r = math.sqrt(((x - xa) ** 2 + (y - ya) ** 2) / denom)
            if za + r * (zb - za) < dem[y, x]:
                return False
            if x == xb:
                return True
            if bal >= 0:
                y += incy
                bal -= DX
            bal += DY
            x += incx
    else:
        DX, DY = dx * 2, dy * 2
        bal = DX - dy
        while True:
            r = math.sqrt(((x - xa) ** 2 + (y - ya) ** 2) / denom)
            if za + r * (zb - za) < dem[y, x]:
                return False
            if y == yb:
                return True
            if bal >= 0:
                x += incx
                bal -= DY
            bal += DX
            y += incy


# targets per numpy broadcast: bounds peak memory at
# ~7 arrays * CHUNK * max_path_len * 8B (CHUNK=512, L=4096 -> ~120 MB)
_CHUNK = 512


def visibility_of_targets(
    dem: np.ndarray,
    ox: int,
    oy: int,
    oz: float,
    tx: np.ndarray,
    ty: np.ndarray,
    target_height: float,
) -> np.ndarray:
    """Vectorized R3 LOS for a batch of target pixels: uint8 (N,),
    1 = visible. Bit-identical to _los_visible per target."""
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty, dtype=np.int64)
    n = len(tx)
    out = np.zeros(n, dtype=np.uint8)
    if n == 0:
        return out
    if oz < dem[oy, ox]:  # observer below terrain: nothing visible
        return out
    for s in range(0, n, _CHUNK):
        xb = tx[s : s + _CHUNK]
        yb = ty[s : s + _CHUNK]
        zb = dem[yb, xb] + float(target_height)  # (T,)
        dxs = np.abs(xb - ox)
        dys = np.abs(yb - oy)
        incx = np.where(xb >= ox, 1, -1)
        incy = np.where(yb >= oy, 1, -1)
        steps = np.maximum(dxs, dys)  # (T,)
        L = int(steps.max()) + 1
        i = np.arange(L, dtype=np.int64)[None, :]  # (1, L)
        dxc, dyc = dxs[:, None], dys[:, None]
        # closed-form Bresenham (integer-exact, matches the scalar
        # recurrence): minor = inc * floor((2*minor_d*i + major_d) / (2*major_d))
        flat = dxc >= dyc
        off = np.where(
            flat,
            (2 * dyc * i + dxc) // np.maximum(2 * dxc, 1),
            (2 * dxc * i + dyc) // np.maximum(2 * dyc, 1),
        )
        x = np.where(flat, ox + incx[:, None] * i, ox + incx[:, None] * off)
        y = np.where(flat, oy + incy[:, None] * off, oy + incy[:, None] * i)
        valid = i <= steps[:, None]
        # Bresenham cells stay inside the endpoint bbox; clip is a
        # no-op safety for the masked-out tail of short paths
        terr = dem[np.clip(y, 0, dem.shape[0] - 1), np.clip(x, 0, dem.shape[1] - 1)]
        denom = (
            (xb - ox).astype(np.float64) ** 2 + (yb - oy).astype(np.float64) ** 2
        )
        denom[denom == 0.0] = 1.0
        dist2 = (x - ox) ** 2 + (y - oy) ** 2
        r = np.sqrt(dist2 / denom[:, None])
        zlos = oz + r * (zb - oz)[:, None]
        blocked = (zlos < terr) & valid
        vis = ~blocked.any(axis=1)
        # scalar prechecks (za handled above; zb < dem[target] here —
        # the r=1 walk cell re-derives zb as za + 1.0*(zb-za), so keep
        # the exact endpoint comparison too)
        vis &= zb >= dem[yb, xb]
        out[s : s + _CHUNK] = vis.astype(np.uint8)
    return out


def _assemble_dem(tiles: DataFrame, spec: RasterSpec, band: int) -> np.ndarray:
    dem = np.zeros((spec.height, spec.width))
    ts = spec.tile_size
    for r in tiles.filter(F.col("band") == band).collect():
        t = np.frombuffer(r["payload"], dtype=r["dtype"]).reshape(r["h"], r["w"])
        dem[r["ty"] * ts : r["ty"] * ts + r["h"], r["tx"] * ts : r["tx"] * ts + r["w"]] = t
    return dem


def viewshed(
    tiles: DataFrame,
    spec: RasterSpec,
    observer: tuple[int, int],
    observer_height: float = 2.0,
    target_height: float = 0.0,
    band: int = 1,
) -> DataFrame:
    """Visibility raster (uint8: 1 visible, 0 hidden) for an observer
    at pixel (ox, oy) standing observer_height above the terrain,
    looking at targets target_height above each cell (the reference's
    dfObserverHeight/dfTargetHeight convention)."""
    ox, oy = int(observer[0]), int(observer[1])
    spark = tiles.sparkSession
    # assemble + broadcast the DEM (inherent to single-observer LOS)
    dem = _assemble_dem(tiles, spec, band)
    bc = spark.sparkContext.broadcast(dem)
    oz = float(dem[oy, ox]) + float(observer_height)
    ts = spec.tile_size

    keys = (
        spark.range(spec.ntiles_y)
        .select(F.col("id").cast("int").alias("ty"))
        .crossJoin(spark.range(spec.ntiles_x).select(F.col("id").cast("int").alias("tx")))
        .repartition(spec.ntiles_y * spec.ntiles_x)
    )

    def _vis(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        d = bc.value
        for kdf in batches:
            rows = []
            for kr in kdf.itertuples(index=False):
                tyy, txx = int(kr.ty), int(kr.tx)
                h, w = spec.tile_shape(tyy, txx)
                jj, ii = np.meshgrid(np.arange(w), np.arange(h))
                gx = (txx * ts + jj).ravel()
                gy = (tyy * ts + ii).ravel()
                out = visibility_of_targets(d, ox, oy, oz, gx, gy, target_height)
                rows.append(
                    {"band": 1, "ty": tyy, "tx": txx, "h": h, "w": w,
                     "dtype": "uint8", "payload": out.reshape(h, w).tobytes()}
                )
            yield pd.DataFrame(rows, columns=["band", "ty", "tx", "h", "w", "dtype", "payload"])

    return keys.mapInPandas(_vis, TILE_SCHEMA)


def cumulative_viewshed(
    tiles: DataFrame,
    spec: RasterSpec,
    observer_spacing: int,
    observer_height: float = 2.0,
    target_height: float = 0.0,
    band: int = 1,
) -> DataFrame:
    """Cumulative viewshed (alg/viewshed/cumulative.cpp): observers on
    a regular grid every observer_spacing pixels (starting at (0, 0)),
    output int32 tiles counting how many observers see each cell.

    Distributed shape: one task per (observer, target-tile) pair runs
    the vectorized R3 kernel — embarrassingly parallel — then a single
    groupBy(tile) sums the per-observer masks."""
    spark = tiles.sparkSession
    dem = _assemble_dem(tiles, spec, band)
    bc = spark.sparkContext.broadcast(dem)
    ts = spec.tile_size
    step = max(int(observer_spacing), 1)
    observers = [
        (int(x), int(y))
        for y in range(0, spec.height, step)
        for x in range(0, spec.width, step)
    ]
    obs_df = spark.createDataFrame(
        pd.DataFrame(observers, columns=["ox", "oy"]).astype("int32")
    )
    keys = (
        spark.range(spec.ntiles_y)
        .select(F.col("id").cast("int").alias("ty"))
        .crossJoin(spark.range(spec.ntiles_x).select(F.col("id").cast("int").alias("tx")))
    )
    pairs = keys.crossJoin(obs_df).repartition(
        max(spec.ntiles_y * spec.ntiles_x, len(observers))
    )

    def _one(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        d = bc.value
        for pdf in batches:
            rows = []
            for kr in pdf.itertuples(index=False):
                tyy, txx = int(kr.ty), int(kr.tx)
                ox_, oy_ = int(kr.ox), int(kr.oy)
                oz = float(d[oy_, ox_]) + float(observer_height)
                h, w = spec.tile_shape(tyy, txx)
                jj, ii = np.meshgrid(np.arange(w), np.arange(h))
                gx = (txx * ts + jj).ravel()
                gy = (tyy * ts + ii).ravel()
                vis = visibility_of_targets(d, ox_, oy_, oz, gx, gy, target_height)
                rows.append(
                    {"band": 1, "ty": tyy, "tx": txx, "h": h, "w": w,
                     "dtype": "int32",
                     "payload": vis.reshape(h, w).astype(np.int32).tobytes()}
                )
            yield pd.DataFrame(rows, columns=["band", "ty", "tx", "h", "w", "dtype", "payload"])

    masks = pairs.mapInPandas(_one, TILE_SCHEMA)

    def _sum(key, pdf: pd.DataFrame) -> pd.DataFrame:
        h, w = int(pdf["h"].iloc[0]), int(pdf["w"].iloc[0])
        acc = np.zeros((h, w), dtype=np.int32)
        for p in pdf["payload"]:
            acc += np.frombuffer(p, dtype=np.int32).reshape(h, w)
        return pd.DataFrame(
            [{"band": 1, "ty": int(key[0]), "tx": int(key[1]), "h": h, "w": w,
              "dtype": "int32", "payload": acc.tobytes()}]
        )

    return masks.groupBy("ty", "tx").applyInPandas(_sum, TILE_SCHEMA)
