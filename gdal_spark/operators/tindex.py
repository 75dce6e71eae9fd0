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


def _wkt_num(x):
    """Plain-decimal WKT coordinate: Spark's double->string cast flips
    to scientific notation at |v| >= 1e7 ('1.0E7'), which is not legal
    WKT syntax — a UTM false northing (10000000.0) would corrupt the
    index geometry.  Integer-valued doubles (every envelope corner the
    reference writes, false northings included) render as exact plain
    decimals; residual limit: NON-integral values >= 1e7 still cast."""
    as_int = x.cast("bigint")
    return F.when(
        as_int.cast("double") == x,
        F.concat(as_int.cast("string"), F.lit(".0")),
    ).otherwise(x.cast("string"))


def _pt(x, y):
    return F.concat(_wkt_num(x), F.lit(" "), _wkt_num(y))


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
    pt = _pt
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


def vector_index(
    features: DataFrame,
    layers_meta: DataFrame | None = None,
    location_col: str = "location",
    layer_col: str = "layer_idx",
    dataset_name_only: bool = False,
    accept_different_crs: bool = False,
    accept_different_schemas: bool = False,
    source_crs_name: str | None = None,
    existing: DataFrame | None = None,
) -> DataFrame:
    """ogrtindex / `gdal vector index`
    (/root/reference/apps/gdalalg_vector_index.cpp): one POLYGON
    feature per indexed source LAYER, geometry = the layer's extent
    rectangle in the reference's OGRPolygon(OGREnvelope) ring order
    (minx miny, minx MAXY, maxx maxy, maxx MINY, close —
    ogr/ogrpolygon.cpp:40-48), location field = "<dataset>,<layerIdx>"
    (gdalalg_vector_index.cpp:509-512) or the bare dataset name under
    --dataset-name-only.

    `features`: the concatenated feature rows of every candidate layer
    — (location, layer_idx, env_minx, env_miny, env_maxx, env_maxy).
    GetExtent(bForce=TRUE) (:692) is a full scan in the reference; here
    it is ONE map-side-combinable groupBy(location, layer_idx) min/max —
    indexing 10^9 features across 10^6 layers is a single shuffle of
    per-partition extent partials, no Python.

    `layers_meta`: optional per-layer metadata (location, layer_idx,
    crs string, schema array<string> of "name:type:width:precision"
    rows) driving the reference's skip rules (metadata-scale — one row
    per layer, broadcast-sized by nature):
      - CRS: layers whose crs differs from the reference layer's are
        skipped unless accept_different_crs (:522-546 — the reference
        warns and skips when !m_acceptDifferentCRS). The reference
        layer is the first indexed layer in input order; here the
        first in (location, layer_idx) order (deterministic under
        parallel input, documented deviation).
      - schema: mismatched field count or any (name, type, width,
        precision) tuple skips the layer unless
        accept_different_schemas (:624-688).
    Empty layers (no feature rows) are skipped, mirroring the
    reference's GetExtent() failure path (:692-698).

    `source_crs_name`: adds a field of that name carrying the layer's
    crs string (the --source-crs-name field; format variants collapse
    to the stored string — this engine models CRS as opaque
    authority strings).

    `existing`: resume — (location) rows already referenced are
    anti-joined away (setAlreadyReferencedLayers, :421).

    Returns (location[, <source_crs_name>], wkt, minx, miny, maxx,
    maxy)."""
    loc = F.col(location_col).cast("string")
    ext = (
        features.groupBy(
            loc.alias("_ds"), F.col(layer_col).cast("int").alias("_li")
        )
        .agg(
            F.min("env_minx").alias("minx"),
            F.min("env_miny").alias("miny"),
            F.max("env_maxx").alias("maxx"),
            F.max("env_maxy").alias("maxy"),
        )
        .filter(F.col("minx").isNotNull())
    )

    crs_col = None
    if layers_meta is not None:
        m = layers_meta.select(
            F.col(location_col).cast("string").alias("_ds"),
            F.col(layer_col).cast("int").alias("_li"),
            F.col("crs").cast("string").alias("_crs"),
            F.col("schema").alias("_schema"),
        )
        ref = m.orderBy("_ds", "_li").first()
        if ref is None:
            raise ValueError("No layer to index")  # :431
        if not accept_different_crs:
            m = m.filter(
                F.col("_crs").eqNullSafe(F.lit(ref["_crs"]))
            )
        if not accept_different_schemas:
            ref_schema = list(ref["_schema"] or [])
            m = m.filter(
                F.col("_schema").eqNullSafe(
                    F.array(*[F.lit(s) for s in ref_schema])
                    if ref_schema
                    else F.array().cast("array<string>")
                )
            )
        ext = ext.join(F.broadcast(m), ["_ds", "_li"])
        crs_col = F.col("_crs")

    if existing is not None:
        keyed = ext.withColumn(
            "_loc",
            F.col("_ds") if dataset_name_only else F.concat(
                F.col("_ds"), F.lit(","), F.col("_li").cast("string")
            ),
        )
        ext = keyed.join(
            existing.select(
                F.col(location_col).cast("string").alias("_xloc")
            ).distinct(),
            F.col("_loc") == F.col("_xloc"),
            "left_anti",
        ).drop("_loc", "_xloc")

    pt = _pt
    mnx, mny, mxx, mxy = (F.col(c) for c in ("minx", "miny", "maxx", "maxy"))
    cols = [
        (
            F.col("_ds") if dataset_name_only else F.concat(
                F.col("_ds"), F.lit(","), F.col("_li").cast("string")
            )
        ).alias("location")
    ]
    if source_crs_name is not None:
        if crs_col is None:
            raise ValueError("source_crs_name requires layers_meta")
        cols.append(crs_col.alias(source_crs_name))
    cols += [
        F.concat(
            F.lit("POLYGON (("),
            pt(mnx, mny), F.lit(","),
            pt(mnx, mxy), F.lit(","),
            pt(mxx, mxy), F.lit(","),
            pt(mxx, mny), F.lit(","),
            pt(mnx, mny),
            F.lit("))"),
        ).alias("wkt"),
        mnx.alias("minx"), mny.alias("miny"),
        mxx.alias("maxx"), mxy.alias("maxy"),
    ]
    return ext.select(*cols)
