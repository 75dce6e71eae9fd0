"""gdal raster create / gdal_create
(/root/reference/apps/gdalalg_raster_create.cpp).

Spec construction is driver-side arithmetic (it sizes a grid, not
data); the PIXELS never materialize unless they must:

  - no burn, or one uniform burn value -> the returned tile table is
    EMPTY and the spec's `init` carries the fill. The repo-wide
    absent-tile convention (every stencil/translate/warp/sink operator
    treats in-bounds missing tiles as init-valued) makes this the
    exact raster — a constant 10^6 x 10^6 raster costs zero bytes and
    zero tasks, where the reference's Fill() writes every block.
  - per-band distinct burn values -> one Arrow pass synthesizes the
    (band, ty, tx) lattice (pure-Catalyst key generation, payloads
    cached per distinct tile shape — at most 4 buffers).

Sizing rules transliterated from the reference:
  - size percentages resolve against the `like` spec (":211-239",
    ceil(ref * pct/100 - EPSILON), EPSILON = 1e-5 :209)
  - one zero size axis infers from the other via the like grid's
    aspect (":302-347") or the bbox aspect (":513-534")
  - explicit resolution + like recomputes size from the resolution
    ratio (":431-473"); resolution + bbox sizes from extent/res
    (":476-491")
  - burn value count must be 1 or band-count (":540-556")
  - geotransform from bbox: north-up, xscale = (maxx-minx)/W,
    yscale = -(maxy-miny)/H (":612-623")
  - nodata "none" unsets; unset inherits like's (":370-376")
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from gdal_spark.operators.raster import TILE_SCHEMA, RasterSpec, copy_word

_EPSILON = 1e-5  # gdalalg_raster_create.cpp:209

_INT_MAX = 2**31 - 1


def _parse_axis(value, like_axis: int | None, name: str) -> int:
    """One size axis: int, or 'N%' of the like spec's axis."""
    if isinstance(value, str) and value.rstrip().endswith("%"):
        if like_axis is None:
            raise ValueError("Cannot use percentage size without input dataset")
        pct = float(value.rstrip().rstrip("%"))
        size = math.ceil(like_axis * pct / 100.0 - _EPSILON)
        if size > _INT_MAX:
            raise ValueError("Computed size is too large")
        return int(size)
    return int(value)


def raster_create(
    size: tuple | None = None,
    resolution: tuple[float, float] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    band_count: int | None = None,
    dtype: str | None = None,
    nodata: float | str | None = None,
    burn: list[float] | None = None,
    like: RasterSpec | None = None,
    like_nodata: float | None = None,
    tile_size: int = 256,
    spark: SparkSession | None = None,
) -> tuple[RasterSpec, DataFrame | None]:
    """Returns (spec, tiles). `tiles` is None when no SparkSession is
    given AND the raster is expressible as spec-only (uniform fill);
    otherwise a TILE_SCHEMA DataFrame (empty for uniform fills)."""
    w = h = None
    gt = like.gt if like is not None else None

    if size is not None:
        w = _parse_axis(size[0], like.width if like else None, "width")
        h = _parse_axis(size[1], like.height if like else None, "height")

    res = list(resolution) if resolution is not None else None

    if like is not None:
        if w is None and h is None and res is None:
            w, h = like.width, like.height
        # one zero axis: infer from the like grid's aspect (:302-347)
        if w == 0 and (h or 0) > 0:
            ratio = like.width / like.height
            w = math.ceil(h * ratio - _EPSILON)
        elif h == 0 and (w or 0) > 0:
            ratio = like.height / like.width
            h = math.ceil(w * ratio - _EPSILON)
        if band_count is None:
            band_count = like.nbands
        if dtype is None:
            dtype = like.dtype
        if nodata is None and like_nodata is not None:
            nodata = like_nodata
        # explicit resolution recomputes size from the like grid (:431-473)
        if res is not None:
            if res[0] == 0:
                res[0] = res[1]
            if res[1] == 0:
                res[1] = res[0]
            xr = abs(like.gt[1]) / res[0]
            yr = abs(like.gt[5]) / res[1]
            w = math.ceil(like.width * xr - _EPSILON)
            h = math.ceil(like.height * yr - _EPSILON)
            if w > _INT_MAX or h > _INT_MAX:
                raise ValueError("Computed size is too large")

    # size from bbox + resolution (:476-491); the zero-axis
    # substitution applies here too, not only under `like`
    if w is None and bbox is not None and res is not None:
        if res[0] == 0:
            res[0] = res[1]
        if res[1] == 0:
            res[1] = res[0]
        if res[0] == 0 or res[1] == 0:
            raise ValueError("Invalid resolution")
        if bbox[2] - bbox[0] != 0 and bbox[3] - bbox[1] != 0:
            w = math.ceil((bbox[2] - bbox[0]) / res[0] - _EPSILON)
            h = math.ceil((bbox[3] - bbox[1]) / res[1] - _EPSILON)
            if w > _INT_MAX or h > _INT_MAX:
                raise ValueError("Computed size is too large")

    if w is None or h is None:
        if res is not None and bbox is None:
            raise ValueError("Cannot use resolution without 'bbox' or 'like' dataset")
        raise ValueError(
            "Argument 'size' or 'resolution' or 'like' dataset should be specified"
        )

    # one zero axis from the bbox aspect (:513-534)
    if (w == 0) != (h == 0) and bbox is not None and (
        bbox[2] - bbox[0] != 0 and bbox[3] - bbox[1] != 0
    ):
        ratio = (bbox[2] - bbox[0]) / (bbox[3] - bbox[1])
        if w == 0:
            w = math.ceil(h * ratio - _EPSILON)
        else:
            h = math.ceil(w / ratio - _EPSILON)

    if not w or not h or w < 0 or h < 0:
        raise ValueError(f"Invalid raster size {w}x{h}")

    nbands = 1 if band_count is None else int(band_count)
    dt = dtype or "uint8"

    if burn is not None and len(burn) not in (1, nbands):
        if nbands == 1:
            raise ValueError(
                "One value should be provided for argument 'burn', "
                "given there is one band"
            )
        raise ValueError(
            f"One or {nbands} values should be provided for argument 'burn', "
            f"given there are {nbands} bands"
        )

    if bbox is not None:
        gt = (
            bbox[0],
            (bbox[2] - bbox[0]) / w,
            0.0,
            bbox[3],
            0.0,
            -(bbox[3] - bbox[1]) / h,
        )
    if gt is None:
        gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)  # ungeoreferenced default

    if isinstance(nodata, str):
        nodata = None if nodata.lower() == "none" else float(nodata)

    uniform = burn is None or len(set(burn)) == 1
    # uniform burns round through GDALCopyWord exactly like the
    # per-band lattice path — otherwise densify's C-truncating np.full
    # and materialize_full's copy_word would disagree on the pixel value
    init = (
        float(copy_word(np.array([float(burn[0])], dtype=np.float64), dt)[0])
        if (burn and uniform)
        else 0.0
    )
    spec = RasterSpec(
        width=int(w), height=int(h), gt=tuple(float(v) for v in gt),
        dtype=dt, nbands=nbands, init=init, tile_size=tile_size,
    )
    # nodata rides as an attribute-style sidecar (RasterSpec is frozen
    # and nodata-free by design; sinks take nodata explicitly and read
    # it back via getattr(spec, "nodata", None))
    if nodata is not None:
        object.__setattr__(spec, "nodata", float(nodata))
    if spark is None:
        if not uniform:
            raise ValueError("per-band burn values need a SparkSession to materialize")
        return spec, None

    if uniform:
        tiles = spark.createDataFrame([], TILE_SCHEMA)
        return spec, tiles

    # distinct per-band burn values: synthesize the dense lattice
    vals = [
        float(copy_word(np.array([bv], dtype=np.float64), dt)[0])
        for bv in (burn if len(burn) == nbands else burn * nbands)
    ]
    nty, ntx = spec.ntiles_y, spec.ntiles_x
    # integer `div`, not float `/`: at 2^53+ lattice ids double division
    # stops being exact and tiles would silently collide/vanish
    lattice = spark.range(nbands * nty * ntx).select(
        (F.col("id") % nbands + 1).cast("int").alias("band"),
        (F.expr(f"id div {nbands}") % nty).cast("int").alias("ty"),
        F.expr(f"id div {nbands * nty}").cast("int").alias("tx"),
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[tuple[int, int, int], bytes] = {}
        for pdf in batches:
            hs, ws, payloads = [], [], []
            for band, ty, tx in zip(pdf["band"], pdf["ty"], pdf["tx"]):
                th, tw = spec.tile_shape(int(ty), int(tx))
                key = (int(band), th, tw)
                if key not in cache:
                    cache[key] = np.full(
                        (th, tw), vals[int(band) - 1], dtype=np.dtype(dt)
                    ).tobytes()
                hs.append(th)
                ws.append(tw)
                payloads.append(cache[key])
            out = pdf[["band", "ty", "tx"]].copy()
            out["h"] = np.asarray(hs, dtype=np.int32)
            out["w"] = np.asarray(ws, dtype=np.int32)
            out["dtype"] = dt
            out["payload"] = payloads
            yield out

    return spec, lattice.mapInPandas(_synth, TILE_SCHEMA)
