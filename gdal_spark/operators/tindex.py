"""gdaltindex — raster tile index as a pure-Catalyst projection.

Reference: /root/reference/apps/gdaltindex_lib.cpp — footprint ring in
pixel-corner order (0,0) -> (W,0) -> (W,H) -> (0,H) -> (0,0) through
the geotransform (:1930-1941 + the [0]/[4] closure), representative
pixel size res = sqrt((maxX-minX)*(maxY-minY)/W/H) with -min_pixel_size
/ -max_pixel_size skips (:2044-2062), the `location` field (:2732), and
"skip files already in the tileindex" (the existing-index scan around
:1100) as an anti-join.

Scale shape: one map-only Catalyst projection over the raster-metadata
table — indexing 10^9 rasters is a scan, zero Python and zero shuffle.
The already-indexed skip broadcasts the existing location list when
small (Spark's planner picks broadcast for the anti-join under the
threshold) and degrades to a shuffle semi-join above it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tile_index(
    meta: DataFrame,
    min_pixel_size: float | None = None,
    max_pixel_size: float | None = None,
    existing: DataFrame | None = None,
    location_col: str = "location",
) -> DataFrame:
    """meta: (location string, width int, height int, gt array<double>[6])
    -> (location, wkt, minx, miny, maxx, maxy, res). Corner math and
    res follow gdaltindex_lib.cpp exactly; rows outside the pixel-size
    bounds are skipped; rows whose location already appears in
    `existing` are skipped (gdaltindex re-run behavior)."""
    g = lambda i: F.col("gt")[i]  # noqa: E731
    w = F.col("width").cast("double")
    h = F.col("height").cast("double")
    xs = [
        g(0),
        g(0) + w * g(1),
        g(0) + w * g(1) + h * g(2),
        g(0) + h * g(2),
    ]
    ys = [
        g(3),
        g(3) + w * g(4),
        g(3) + w * g(4) + h * g(5),
        g(3) + h * g(5),
    ]
    df = meta
    if existing is not None:
        df = df.join(
            existing.select(F.col(location_col).alias("_loc")).distinct(),
            df[location_col] == F.col("_loc"),
            "left_anti",
        )
    pt = lambda x, y: F.concat(x.cast("string"), F.lit(" "), y.cast("string"))  # noqa: E731
    out = df.select(
        F.col(location_col).alias("location"),
        F.concat(
            F.lit("POLYGON (("),
            pt(xs[0], ys[0]), F.lit(","),
            pt(xs[1], ys[1]), F.lit(","),
            pt(xs[2], ys[2]), F.lit(","),
            pt(xs[3], ys[3]), F.lit(","),
            pt(xs[0], ys[0]),
            F.lit("))"),
        ).alias("wkt"),
        F.least(*xs).alias("minx"),
        F.least(*ys).alias("miny"),
        F.greatest(*xs).alias("maxx"),
        F.greatest(*ys).alias("maxy"),
        F.sqrt(
            (F.greatest(*xs) - F.least(*xs)) * (F.greatest(*ys) - F.least(*ys)) / w / h
        ).alias("res"),
    )
    if min_pixel_size is not None:
        out = out.filter(F.col("res") >= F.lit(float(min_pixel_size)))
    if max_pixel_size is not None:
        out = out.filter(F.col("res") <= F.lit(float(max_pixel_size)))
    return out
