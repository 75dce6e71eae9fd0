"""ogr2ogr / GDALVectorTranslate as one composable operator.

Reference: apps/ogr2ogr_lib.cpp LayerTranslator::Translate (:6507) —
the per-feature stage order is semantic (clip-before-reproject changes
vertices) and is reproduced exactly:

  SetSpatialFilter/-spat + SetAttributeFilter/-where   (:7710, :7717)
   -> explode collections        (:6531)
   -> segmentize                 (:6953)
   -> simplify                   (:6960)
   -> CLIP-SRC                   (:6969)
   -> REPROJECT (t_srs)          (:7021)
   -> CLIP-DST                   (:7176)
   -> MakeValid                  (:7262)
   -> -select / -limit           (:7739, :8433)

Spark shape: -where/-select/-limit are Catalyst (filter/select/limit);
-spat is the FilterGeometry cascade; the geometry chain runs in ONE
mapInPandas pass per batch (parse once, all stages in numpy, emit WKT
once) — the per-feature Volcano pipeline of the reference becomes a
single Arrow-batched stage with no intermediate shuffles at all.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, BooleanType, StringType, StructField, StructType

from gdal_spark.geom.batch import GeomBatchBuilder, GeomType
from gdal_spark.geom.ops import make_valid as _make_valid
from gdal_spark.geom.ops import segmentize as _segmentize
from gdal_spark.geom.ops import simplify_dp
from gdal_spark.geom.overlay import clip_line, overlay
from gdal_spark.geom.wkt import parse_wkt, to_wkt


def _region_from_wkt(wkt: str) -> list:
    b = parse_wkt([wkt])
    return [b.polygon_rings(0)]


def _emit(builder_parts: list, gtype: GeomType):
    b = GeomBatchBuilder()
    b.add(gtype, builder_parts)
    return to_wkt(b.finish())[0]


def _polys_out(polys: list) -> str | None:
    if not polys:
        return None
    parts = [[shell] + list(holes) for shell, holes in polys]
    return _emit(parts, GeomType.POLYGON if len(parts) == 1 else GeomType.MULTIPOLYGON)


def _clip_geom(gtype: GeomType, parts: list, region: list) -> tuple[GeomType, list] | None:
    """Clip one geometry against a polygon region; returns the
    surviving (type, parts) or None (feature dropped, :7010)."""
    from gdal_spark.geom.predicates import points_in_edges, rings_to_edges

    if gtype in (GeomType.POINT, GeomType.MULTIPOINT):
        pts = np.concatenate([r[0] for r in parts], axis=0)
        inside = np.zeros(len(pts), dtype=bool)
        for rings in region:
            inside |= points_in_edges(pts[:, 0], pts[:, 1], rings_to_edges(rings))
        kept = pts[inside]
        if not len(kept):
            return None
        if len(kept) == 1:
            return GeomType.POINT, [[kept[:1]]]
        return GeomType.MULTIPOINT, [[kept[j : j + 1]] for j in range(len(kept))]
    if gtype in (GeomType.LINESTRING, GeomType.MULTILINESTRING):
        pieces: list[np.ndarray] = []
        for rings in parts:
            pieces.extend(clip_line(rings[0], region, keep_inside=True))
        if not pieces:
            return None
        if len(pieces) == 1:
            return GeomType.LINESTRING, [[pieces[0]]]
        return GeomType.MULTILINESTRING, [[p] for p in pieces]
    rings_flat = [r for rings in parts for r in rings]
    polys = overlay([rings_flat], region, "and")
    if not polys:
        return None
    new_parts = [[shell] + list(holes) for shell, holes in polys]
    t = GeomType.POLYGON if len(new_parts) == 1 else GeomType.MULTIPOLYGON
    return t, new_parts


_EXPLODED = {
    GeomType.MULTIPOINT: GeomType.POINT,
    GeomType.MULTILINESTRING: GeomType.LINESTRING,
    GeomType.MULTIPOLYGON: GeomType.POLYGON,
}

# wrapdateline cut rectangles (ogrgeometryfactory.cpp:3530-3541):
# part 1 ([-180,180]) stays, part 2 ([180,360] / [-360,-180]) shifts
# lon by -+360. The reference uses whole-world rectangles; here each
# rectangle is shrunk to the geometry's envelope (+1 degree margin) —
# the intersection is identical, but the overlay snap grid stays fine
# (a 360-degree-wide rectangle would coarsen it ~100x and smear the
# +-180 cut by microdegrees).


def _cut_rect_region(x0: float, x1: float, rings: list) -> list | None:
    env_x = np.concatenate([r[:, 0] for r in rings if len(r)])
    env_y = np.concatenate([r[:, 1] for r in rings if len(r)])
    rx0 = max(x0, float(env_x.min()) - 1.0)
    rx1 = min(x1, float(env_x.max()) + 1.0)
    ry0 = max(-90.0, float(env_y.min()) - 1.0)
    ry1 = min(90.0, float(env_y.max()) + 1.0)
    if rx0 >= rx1 or ry0 >= ry1:
        return None
    rect = np.array(
        [[rx0, ry0], [rx1, ry0], [rx1, ry1], [rx0, ry1], [rx0, ry0]]
    )
    return [[rect]]


def _wrap_dateline(
    t: GeomType, ps: list, offset: float
) -> tuple[GeomType, list] | None:
    """ogr2ogr -wrapdateline: CutGeometryOnDateLineAndAddToMulti
    (ogrgeometryfactory.cpp:3417) — points normalize lon; crossing
    lines split at +-180; crossing polygons get the coordinate fix
    then a two-rectangle cut with the western part shifted 360.
    Returns the (possibly multi) result, None if everything vanished."""
    from gdal_spark.geom.dateline import (
        detect_crossing,
        fix_polygon_rings,
        split_linestring,
        wrap_point_lon,
    )

    if t in (GeomType.POINT, GeomType.MULTIPOINT):
        new = []
        for rings in ps:
            p = rings[0].copy()
            p[:, 0] = [wrap_point_lon(float(x)) for x in p[:, 0]]
            new.append([p])
        return t, new

    is_poly = t in (GeomType.POLYGON, GeomType.MULTIPOLYGON)
    line_parts: list[np.ndarray] = []
    poly_parts: list[list[np.ndarray]] = []
    for rings in ps:  # per sub-geometry, like the reference's multi walk
        branch, around = detect_crossing(rings, offset)
        if branch is None:
            (poly_parts if is_poly else line_parts).append(
                rings if is_poly else rings[0]
            )
            continue
        if not is_poly:
            if branch == "bigdiff":
                xoff = 360.0 if around else 0.0
                line_parts.extend(split_linestring(rings[0], offset, xoff))
                continue
            # envelope branch: rectangle cut (GEOS path in the reference)
            work = [rings]
        else:
            work = [fix_polygon_rings(rings, offset) if branch == "bigdiff" else rings]
        shift = 360.0 if around else -360.0
        flat = [r for rr in work for r in rr]
        reg1 = _cut_rect_region(-180.0, 180.0, flat)
        reg2 = (
            _cut_rect_region(-360.0, -180.0, flat)
            if around
            else _cut_rect_region(180.0, 360.0, flat)
        )
        wt = t if is_poly else GeomType.LINESTRING
        r1 = _clip_geom(wt, work, reg1) if reg1 is not None else None
        r2 = _clip_geom(wt, work, reg2) if reg2 is not None else None
        for res, dx in ((r1, 0.0), (r2, shift)):
            if res is None:
                continue
            _, rps = res
            for rr in rps:
                shifted = []
                for r in rr:
                    x = r[:, 0] + dx
                    # the overlay snap grid can quantize the cut a few
                    # nanodegrees off the dateline; the reference's
                    # rectangle vertices are exact — snap back
                    x = np.where(np.abs(x - 180.0) < 1e-6, 180.0, x)
                    x = np.where(np.abs(x + 180.0) < 1e-6, -180.0, x)
                    shifted.append(np.column_stack([x, r[:, 1]]))
                if is_poly:
                    poly_parts.append(shifted)
                else:
                    line_parts.append(shifted[0])
    if is_poly:
        if not poly_parts:
            return None
        tt = GeomType.POLYGON if len(poly_parts) == 1 else GeomType.MULTIPOLYGON
        return tt, poly_parts
    if not line_parts:
        return None
    if len(line_parts) == 1:
        return GeomType.LINESTRING, [[line_parts[0]]]
    return GeomType.MULTILINESTRING, [[seg] for seg in line_parts]


def vector_translate(
    df: DataFrame,
    wkt_col: str = "wkt",
    where: str | None = None,
    spat: tuple[float, float, float, float] | None = None,
    explode_collections: bool = False,
    segmentize_max: float | None = None,
    simplify_tol: float | None = None,
    clip_src: str | None = None,
    pipeline=None,  # geom/proj.Pipeline: src CRS -> dst CRS
    wrapdateline: bool = False,
    dateline_offset: float = 10.0,
    clip_dst: str | None = None,
    make_valid: bool = False,
    select: Sequence[str] | None = None,
    limit: int | None = None,
    out_col: str = "wkt",
) -> DataFrame:
    """The full ogr2ogr stage chain over a WKT layer. Geometry-less
    rows and rows whose geometry is clipped away are dropped, matching
    the reference; explode_collections multiplies rows 1:N BEFORE any
    geometry op (ogr2ogr_lib.cpp:6531)."""
    if where:
        from gdal_spark.ogr_sql import compile_where

        df = df.filter(compile_where(where, df))
    if spat is not None:
        from gdal_spark.operators.spatial import spatial_filter

        minx, miny, maxx, maxy = spat
        rect = (
            f"POLYGON (({minx} {miny},{minx} {maxy},{maxx} {maxy},"
            f"{maxx} {miny},{minx} {miny}))"
        )
        df = spatial_filter(df, rect, wkt_col=wkt_col)

    src_region = _region_from_wkt(clip_src) if clip_src else None
    dst_region = _region_from_wkt(clip_dst) if clip_dst else None

    out_fields = [f for f in df.schema.fields if f.name != wkt_col]
    out_schema = StructType(out_fields + [StructField(out_col, StringType())])

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            batch = parse_wkt(pdf[wkt_col])
            keep_rows: list[int] = []
            out_wkts: list[str] = []
            for i in range(len(batch)):
                if batch.is_null[i] or batch.is_empty[i]:
                    continue
                gtype, parts = batch.geometry(i)
                gtype = GeomType(gtype)
                if explode_collections and gtype in _EXPLODED:
                    units = [(_EXPLODED[gtype], [p]) for p in parts]
                elif gtype == GeomType.GEOMETRYCOLLECTION:
                    # GC always processes per atomic member (r3;
                    # ogr2ogr explodes GCs too, ogr2ogr_lib.cpp:6531 —
                    # without -explodecollections the survivors stay
                    # one row, reassembled as a collection below)
                    units = [(mt, [rings]) for mt, rings in batch.collection_members(i)]
                else:
                    units = [(gtype, parts)]
                gc_reassemble = gtype == GeomType.GEOMETRYCOLLECTION and not explode_collections
                gc_pieces: list[str] = []
                for ut, uparts in units:
                    t, ps = ut, uparts
                    if segmentize_max is not None:
                        ps = [[_segmentize(r, segmentize_max) for r in rings] for rings in ps]
                    if simplify_tol is not None:
                        ps = [[simplify_dp(r, simplify_tol) for r in rings] for rings in ps]
                    if src_region is not None:
                        clipped = _clip_geom(t, ps, src_region)
                        if clipped is None:
                            continue
                        t, ps = clipped
                    if pipeline is not None:
                        ps = [
                            [np.column_stack(pipeline.forward(r[:, 0], r[:, 1])) for r in rings]
                            for rings in ps
                        ]
                    if wrapdateline:
                        # reference applies it inside the reprojection
                        # step (transformWithOptions WRAPDATELINE=YES,
                        # ogr2ogr_lib.cpp -wrapdateline)
                        wrapped = _wrap_dateline(t, ps, dateline_offset)
                        if wrapped is None:
                            continue
                        t, ps = wrapped
                    if dst_region is not None:
                        clipped = _clip_geom(t, ps, dst_region)
                        if clipped is None:
                            continue
                        t, ps = clipped
                    if make_valid and t in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
                        w = _polys_out(_make_valid([r for rings in ps for r in rings]))
                        if w is None:
                            continue
                        if gc_reassemble:
                            gc_pieces.append(w)
                        else:
                            keep_rows.append(i)
                            out_wkts.append(w)
                        continue
                    if gc_reassemble:
                        gc_pieces.append(_emit(ps, t))
                    else:
                        keep_rows.append(i)
                        out_wkts.append(_emit(ps, t))
                if gc_reassemble and gc_pieces:
                    keep_rows.append(i)
                    out_wkts.append(
                        gc_pieces[0]
                        if len(gc_pieces) == 1
                        else "GEOMETRYCOLLECTION (" + ",".join(gc_pieces) + ")"
                    )
            res = pdf.iloc[keep_rows].drop(columns=[wkt_col]).copy()
            res[out_col] = out_wkts
            yield res

    out = df.mapInPandas(_run, out_schema)
    if select:
        out = out.select(*select, out_col)
    if limit is not None:
        out = out.limit(limit)
    return out


# ---------------------------------------------------------------------------
# `gdal vector make-point` / `gdal vector swap-xy`


def make_point(
    df: DataFrame,
    x_field: str,
    y_field: str,
    z_field: str | None = None,
    wkt_col: str = "wkt",
) -> DataFrame:
    """`gdal vector make-point`
    (apps/gdalalg_vector_make_point.cpp): build a POINT (or POINT Z)
    geometry from coordinate fields; string fields parse as doubles
    (the CPLAtof path). Invalid / NULL coordinate values yield a NULL
    geometry (documented deviation: the reference errors the feature;
    a 10^12-row pipeline wants the row quarantined, not the job
    failed). Pure Catalyst — no Python, no shuffle."""
    x = F.col(x_field).try_cast("double")
    y = F.col(y_field).try_cast("double")
    parts = [F.lit("POINT ("), _fmt_d_col(x), F.lit(" "), _fmt_d_col(y)]
    ok = x.isNotNull() & y.isNotNull()
    if z_field is not None:
        z = F.col(z_field).try_cast("double")
        parts = [F.lit("POINT Z ("), _fmt_d_col(x), F.lit(" "), _fmt_d_col(y), F.lit(" "), _fmt_d_col(z)]
        ok = ok & z.isNotNull()
    wkt = F.concat(*parts, F.lit(")"))
    return df.withColumn(wkt_col, F.when(ok, wkt))


def _fmt_d_col(c):
    """Catalyst twin of geom/wkt.py _fmt_d for the values make-point
    emits: integral doubles print without a trailing .0 (OGR %.15g),
    non-integral ones via Spark's shortest-repr string cast (which is
    %.17g-shortest — a superset of %.15g for exactly-representable
    inputs; make-point coordinates come straight from user fields, so
    round-tripping them losslessly IS the reference behavior)."""
    i = c.try_cast("bigint")
    return F.when(
        i.isNotNull() & (i.cast("double") == c), i.cast("string")
    ).otherwise(c.cast("string"))


def swap_xy(df: DataFrame, wkt_col: str = "wkt") -> DataFrame:
    """`gdal vector swap-xy` (apps/gdalalg_vector_swap_xy.cpp →
    OGRGeometry::swapXY): exchange X and Y of every vertex of every
    geometry type. One Arrow pass (vertex arrays flip in numpy); rows
    with NULL/invalid geometry pass through unchanged."""
    from gdal_spark.geom.wkt import parse_wkt, to_wkt

    out_schema = df.schema

    def _swap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.reset_index(drop=True)
            wkt = pdf[wkt_col]
            mask = wkt.notna()
            if mask.any():
                batch, errors = parse_wkt(wkt[mask], return_errors=True)
                if batch.coords.size:
                    batch.coords[:] = batch.coords[:, ::-1]
                swapped = to_wkt(batch)
                vals = wkt.to_numpy(object).copy()
                idx = np.flatnonzero(mask.to_numpy())
                for j, i in enumerate(idx):
                    if errors[j] is None:
                        vals[i] = swapped[j]
                pdf[wkt_col] = vals
            yield pdf

    return df.mapInPandas(_swap, out_schema)


def concave_hull_geom(
    df: DataFrame, wkt_col: str = "wkt", ratio: float = 0.5, allow_holes: bool = False
) -> DataFrame:
    """`gdal vector concave-hull`
    (apps/gdalalg_vector_concave_hull.cpp → OGRGeometry::ConcaveHull,
    the JTS/GEOS edge-length-ratio algorithm): per-feature hull over
    the geometry's vertices (geom/concave.py). ratio=1 degenerates to
    the convex hull; degenerate inputs (<3 non-collinear vertices)
    yield a NULL geometry. One Arrow pass, no shuffle."""
    from gdal_spark.geom.concave import concave_hull as _hull

    out_schema = df.schema

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.reset_index(drop=True)
            wkt = pdf[wkt_col]
            mask = wkt.notna()
            vals = wkt.to_numpy(object).copy()
            if mask.any():
                batch, errors = parse_wkt(wkt[mask], return_errors=True)
                idx = np.flatnonzero(mask.to_numpy())
                for j, i in enumerate(idx):
                    if errors[j] is not None or batch.is_null[j]:
                        vals[i] = None
                        continue
                    s = batch.geom_part_off[j]
                    e = batch.geom_part_off[j + 1]
                    c0 = batch.ring_coord_off[batch.part_ring_off[s]]
                    c1 = batch.ring_coord_off[batch.part_ring_off[e]]
                    rings = _hull(batch.coords[c0:c1], ratio, allow_holes)
                    if rings is None:
                        vals[i] = None
                        continue
                    b = GeomBatchBuilder()
                    b.add(GeomType.POLYGON, [rings])
                    vals[i] = to_wkt(b.finish())[0]
            pdf[wkt_col] = vals
            yield pdf

    return df.mapInPandas(_run, out_schema)


# ---------------------------------------------------------------------------
# `gdal vector explode` — zip-explode list fields (+ geometry parts)


def vector_explode(
    df: DataFrame,
    fields: Sequence[str] = (),
    index_field: str | None = None,
    geometry: bool = False,
    wkt_col: str = "geom",
    fid_col: str | None = None,
) -> DataFrame:
    """`gdal vector explode` (apps/gdalalg_vector_explode.cpp
    TranslateFeature): each source feature becomes
    N = max(1, exploded list lengths, exploded collection sizes)
    features; element i of every exploded list field rides feature i
    (STRICT zip — a list shorter than N errors with the reference's
    "does not have enough elements" message, which also catches NULL
    lists), `index_field` (when set) holds i as the FIRST field
    (:287), and with geometry=True a collection geometry contributes
    its i-th member in order (exhausted/empty collection errors,
    :400-414) while a NON-collection geometry rides feature 0 only
    (feature 1 gets NULL, N>2 errors "is not a collection",
    :418-431; a NULL geometry never errors and yields NULL rows).
    FIDs are not reassigned (the repo carries no FID column; the
    reference renumbers sequentially).

    Distributed shape: pure Catalyst — N, every length guard
    (raise_error inside when/otherwise) and the element gathers are
    whole-stage-codegen expressions over one explode(sequence());
    geometry=True prepends ONE Arrow pass that splits collection WKTs
    into an array<string> parts column (the only Python crossing)."""
    fields = list(fields)
    for f in fields:
        if not df.schema[f].dataType.typeName().startswith("array"):
            raise ValueError(f"field {f!r} is not list-typed")

    fid_expr = F.col(fid_col).cast("string") if fid_col else F.lit("?")

    if geometry:
        in_fields = df.schema.fields
        parts_schema = StructType(
            list(in_fields)
            + [StructField("_parts", ArrayType(StringType())),
               StructField("_is_coll", BooleanType())]
        )

        def _split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.reset_index(drop=True)
                batch = parse_wkt(pdf[wkt_col])
                parts_col: list[list[str] | None] = []
                coll_col: list[bool] = []
                empty = batch.is_empty
                for i in range(len(batch)):
                    if batch.is_null[i]:
                        parts_col.append(None)
                        coll_col.append(False)
                        continue
                    gtype = GeomType(batch.types[i])
                    if gtype in _EXPLODED:
                        if empty[i]:
                            parts_col.append([])
                            coll_col.append(True)
                            continue
                        _, parts = batch.geometry(i)
                        parts_col.append([_emit([p], _EXPLODED[gtype]) for p in parts])
                        coll_col.append(True)
                    elif gtype == GeomType.GEOMETRYCOLLECTION:
                        members = [] if empty[i] else batch.collection_members(i)
                        parts_col.append([_emit([rings], mt) for mt, rings in members])
                        coll_col.append(True)
                    else:
                        parts_col.append(None)
                        coll_col.append(False)
                pdf["_parts"] = parts_col
                pdf["_is_coll"] = coll_col
                yield pdf

        df = df.mapInPandas(_split, parts_schema)

    n_terms = [F.lit(1)] + [F.size(F.col(f)) for f in fields]
    if geometry:
        n_terms.append(F.when(F.col("_is_coll"), F.size("_parts")).otherwise(F.lit(1)))
    n = F.greatest(*n_terms) if len(n_terms) > 1 else n_terms[0]

    df = df.withColumn("_N", n).withColumn(
        "_i", F.explode(F.sequence(F.lit(0), F.col("_N") - F.lit(1)))
    )

    out_cols = []
    if index_field:
        out_cols.append(F.col("_i").cast("int").alias(index_field))
    for fld in df.schema.fields:
        name = fld.name
        if name in ("_N", "_i", "_parts", "_is_coll"):
            continue
        if name in fields:
            out_cols.append(
                F.when(
                    F.coalesce(F.size(F.col(name)), F.lit(-1)) < F.col("_N"),
                    F.raise_error(F.concat(
                        F.lit(f"Field '{name}' of source feature "), fid_expr,
                        F.lit(" does not have enough elements."))),
                ).otherwise(F.col(name)[F.col("_i")]).alias(name)
            )
        elif geometry and name == wkt_col:
            out_cols.append(
                F.when(
                    F.col("_is_coll"),
                    F.when(
                        F.size("_parts") < F.col("_N"),
                        F.raise_error(F.concat(
                            F.lit("Geometry field of source feature "), fid_expr,
                            F.lit(" has "), F.size("_parts").cast("string"),
                            F.lit(" elements (expected "), F.col("_N").cast("string"),
                            F.lit(")"))),
                    ).otherwise(F.col("_parts")[F.col("_i")]),
                ).otherwise(
                    F.when(
                        F.col(wkt_col).isNotNull() & (F.col("_N") > 2) & (F.col("_i") >= 2),
                        F.raise_error(F.concat(
                            F.lit("Geometry field of source feature "), fid_expr,
                            F.lit(" is not a collection."))),
                    ).otherwise(F.when(F.col("_i") == 0, F.col(wkt_col)))
                ).alias(name)
            )
        else:
            out_cols.append(F.col(name))
    return df.select(*out_cols)


# ---------------------------------------------------------------------------
# `gdal vector set-geom-type`


_SINGLE_OF = {
    GeomType.MULTIPOINT: GeomType.POINT,
    GeomType.MULTILINESTRING: GeomType.LINESTRING,
    GeomType.MULTIPOLYGON: GeomType.POLYGON,
}


def set_geom_type(
    df: DataFrame,
    geom_type: str | None = None,
    multi: bool = False,
    single: bool = False,
    skip: bool = False,
    wkt_col: str = "geom",
) -> DataFrame:
    """`gdal vector set-geom-type`
    (apps/gdalalg_vector_set_geom_type.cpp TranslateFeature/ConvertType):
    per feature, the target type is the explicit `geom_type` when
    given, else GetCollection(current) under `multi` (already-multi /
    GC unchanged), else GetSingle(current) under `single`; the
    geometry converts via OGRGeometryFactory::forceTo (geom/force.py —
    the full linear-lattice rule set: closed-line->polygon, ring
    aggregation, endpoint merge, GC promotion, single-member escape).
    A conversion forceTo leaves undone keeps the original geometry —
    unless `skip`, which DROPS features whose converted type still
    differs from the target (:277-283). NULL geometries pass through
    untouched (and are never skipped — the reference only converts
    non-null geometries).

    Distributed shape: one Arrow map pass (no shuffle)."""
    from gdal_spark.geom.force import ATOMIC, COLLECTION_OF, force_to

    target_fixed = GeomType[geom_type.upper()] if geom_type else None
    if multi and single:
        raise ValueError("multi and single are mutually exclusive")
    if target_fixed is None and not (multi or single):
        raise ValueError("set_geom_type needs geom_type, multi or single")

    out_fields = list(df.schema.fields)
    out_schema = StructType(out_fields)

    def _member_list(batch, i):
        gtype = GeomType(batch.types[i])
        if gtype == GeomType.GEOMETRYCOLLECTION:
            return gtype, list(batch.collection_members(i))
        _, parts = batch.geometry(i)
        if gtype in _SINGLE_OF:
            return gtype, [(_SINGLE_OF[gtype], p) for p in parts]
        return gtype, [(gtype, parts[0])]

    def _wkt_out(gtype, members):
        if not members:
            return f"{gtype.name} EMPTY"
        if gtype in ATOMIC:
            return _emit([members[0][1]], gtype)
        if gtype == GeomType.GEOMETRYCOLLECTION:
            return ("GEOMETRYCOLLECTION ("
                    + ",".join(_emit([rings], mt) for mt, rings in members) + ")")
        return _emit([rings for _, rings in members], gtype)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            batch = parse_wkt(pdf[wkt_col])
            empty = batch.is_empty
            vals: list[str | None] = []
            keep: list[bool] = []
            for i in range(len(batch)):
                if batch.is_null[i]:
                    vals.append(None)
                    keep.append(True)
                    continue
                gtype = GeomType(batch.types[i])
                members = [] if empty[i] else _member_list(batch, i)[1]
                if target_fixed is not None:
                    target = target_fixed
                elif multi:
                    target = COLLECTION_OF.get(gtype, gtype)
                else:
                    target = _SINGLE_OF.get(gtype, gtype)
                t2, m2 = force_to(gtype, members, target)
                if skip and t2 != target:
                    keep.append(False)
                    vals.append(None)
                    continue
                keep.append(True)
                vals.append(_wkt_out(t2, m2))
            pdf[wkt_col] = vals
            yield pdf[pd.Series(keep, dtype=bool)]

    return df.mapInPandas(_run, out_schema)
