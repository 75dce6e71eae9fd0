"""`gdal raster overview refresh` — incremental pyramid maintenance.

Reference: apps/gdalalg_raster_overview_refresh.cpp —
PartialRefreshFromBBOX (:395-446: bbox -> pixel window through the
inverse geotransform with the +-1e-8 snap rules) feeding
PartialRefresh (:68-112: regenerate ONLY the chosen overview levels
over that window; everything else is untouched).

Spark shape (the incremental-maintenance pattern): the dirty window
names a rectangle of PARENT tile keys per level; only the children of
those parents are read from the source level (pure Catalyst tile-key
range filter — partition-prunable under a (z, ty, tx) layout), only
those parents are regenerated through the existing overview_level
kernel, and the untouched parents of the existing overview table pass
through an anti-join on the affected-key set. At a continental mosaic
this refreshes one scene's footprint without touching the pyramid
elsewhere — no full recompute, no driver data movement.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from gdal_spark.operators.gdalmove import inv_geotransform
from gdal_spark.operators.tiles import overview_level

_EPS = 1e-8  # gdalalg_raster_overview_refresh.cpp:426


def window_from_bbox(
    spec, bbox: tuple[float, float, float, float]
) -> tuple[int, int, int, int]:
    """(ulx, lry, lrx, uly) world bbox -> (xoff, yoff, xsize, ysize)
    base pixels — bit-faithful to PartialRefreshFromBBOX (:402-443):
    inverse-GT both corners, snap with +-1e-8, clamp to the raster."""
    ulx, lry, lrx, uly = bbox
    inv = inv_geotransform(spec.gt)
    if inv is None:
        raise ValueError("non-invertible geotransform")
    x1 = inv[0] + inv[1] * ulx + inv[2] * uly
    y1 = inv[3] + inv[4] * ulx + inv[5] * uly
    x2 = inv[0] + inv[1] * lrx + inv[2] * lry
    y2 = inv[3] + inv[4] * lrx + inv[5] * lry
    xoff = int(max(0.0, min(x1, x2)) + _EPS)
    yoff = int(max(0.0, min(y1, y2)) + _EPS)
    xsize = int(math.ceil(min(float(spec.width), max(x1, x2)) - _EPS)) - xoff
    ysize = int(math.ceil(min(float(spec.height), max(y1, y2)) - _EPS)) - yoff
    return xoff, yoff, xsize, ysize


def affected_parent_range(
    window: tuple[int, int, int, int], tile_size: int
) -> tuple[int, int, int, int]:
    """Parent-tile key rectangle (ptx0, ptx1, pty0, pty1) whose 2x2
    child blocks intersect the source-level pixel window."""
    xoff, yoff, xsize, ysize = window
    if xsize <= 0 or ysize <= 0:
        return 0, -1, 0, -1
    return (
        (xoff // tile_size) // 2,
        ((xoff + xsize - 1) // tile_size) // 2,
        (yoff // tile_size) // 2,
        ((yoff + ysize - 1) // tile_size) // 2,
    )


def overview_refresh_windows(
    source_tiles: DataFrame,
    existing_overview: DataFrame,
    windows: list[tuple[int, int, int, int]],
    resampling: str = "average",
    tile_size: int = 256,
) -> DataFrame:
    """The `--like` form (PartialRefreshFromSourceExtent :279-390): one
    dirty window per source extent, all refreshed in ONE pass — the
    affected-parent set is the union of the window rectangles (OR of
    key ranges in both the children filter and the pass-through
    anti-filter), where the reference loops PartialRefresh per region.
    Overlapping rectangles regenerate each parent exactly once (the
    children filter is a row filter, not a fan-out)."""
    rects = [affected_parent_range(w, tile_size) for w in windows]
    rects = [r for r in rects if r[1] >= r[0] and r[3] >= r[2]]
    if not rects:
        return existing_overview

    def rect_pred(ptx0, ptx1, pty0, pty1):
        return (
            (F.col("tx") >= ptx0) & (F.col("tx") <= ptx1)
            & (F.col("ty") >= pty0) & (F.col("ty") <= pty1)
        )

    in_rects = rect_pred(*rects[0])
    child_pred = rect_pred(2 * rects[0][0], 2 * rects[0][1] + 1,
                           2 * rects[0][2], 2 * rects[0][3] + 1)
    for r in rects[1:]:
        in_rects = in_rects | rect_pred(*r)
        child_pred = child_pred | rect_pred(2 * r[0], 2 * r[1] + 1,
                                            2 * r[2], 2 * r[3] + 1)
    # a parent inside any rect always gets its COMPLETE child block
    # (the child ranges are exactly the rects' children), so
    # regenerated parents == the union rect set — disjoint from kept
    regenerated = overview_level(
        source_tiles.filter(child_pred), resampling=resampling, tile_size=tile_size
    )
    return existing_overview.filter(~in_rects).unionByName(regenerated)


def overview_refresh(
    source_tiles: DataFrame,
    existing_overview: DataFrame,
    window: tuple[int, int, int, int],
    resampling: str = "average",
    tile_size: int = 256,
) -> DataFrame:
    """Refresh one overview level over a source-level pixel window.

    source_tiles / existing_overview: tile tables with (z, ty, tx,
    band, dtype, payload); the overview is at source z - 1. `window`
    is (xoff, yoff, xsize, ysize) in SOURCE-level pixels (use
    window_from_bbox for the --bbox form). Returns the full refreshed
    overview table: untouched parents verbatim (anti-join on the
    affected-key rectangle), affected parents regenerated from their
    children through overview_level's exact kernels. For several
    levels, cascade: each level's output is the next call's source
    (with the window halved: PartialRefresh regenerates every
    requested level from the same base window). The children filter is
    a pure key-range predicate on the source level — prunable at the
    scan under a (z, ty, tx) layout; a parent inside the rectangle
    with NO children disappears, matching the sparse tile-table
    convention.
    """
    return overview_refresh_windows(
        source_tiles, existing_overview, [window],
        resampling=resampling, tile_size=tile_size,
    )


def halve_window(window: tuple[int, int, int, int]) -> tuple[int, int, int, int]:
    """The same dirty window one level up (for cascading refreshes)."""
    xoff, yoff, xsize, ysize = window
    if xsize <= 0 or ysize <= 0:
        return 0, 0, 0, 0
    x1 = (xoff + xsize + 1) // 2
    y1 = (yoff + ysize + 1) // 2
    return xoff // 2, yoff // 2, x1 - xoff // 2, y1 - yoff // 2
