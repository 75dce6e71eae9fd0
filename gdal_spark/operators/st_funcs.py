"""ST_* scalar geometry functions over WKT columns.

The Spark analog of the reference's SQLite-dialect function set
(ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp — ST_Area :636,
ST_Length :681) and the GEOS-backed OGRGeometry predicate methods
(ogrgeometry.cpp:575+). All are Arrow-batched pandas UDFs over the
numpy geometry kernels; register_st_functions() exposes them to
spark.sql, mirroring OGRSQLiteRegisterSQLFunctions
(ogrsqlitesqlfunctions.cpp:1111).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import BooleanType, DoubleType, StringType

from gdal_spark.geom.relate import PREDICATES, Geometry
from gdal_spark.geom.wkt import parse_wkt


def _pair_udf(name: str):
    pred = PREDICATES[name]

    @F.pandas_udf(BooleanType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        ba = parse_wkt(a)
        bb = parse_wkt(b)
        out = np.zeros(len(ba), dtype=object)
        for i in range(len(ba)):
            if ba.is_null[i] or bb.is_null[i]:
                out[i] = None
            else:
                out[i] = bool(pred(Geometry.from_batch(ba, i), Geometry.from_batch(bb, i)))
        return pd.Series(out)

    return _udf


st_intersects = _pair_udf("intersects")
st_disjoint = _pair_udf("disjoint")
st_within = _pair_udf("within")
st_contains = _pair_udf("contains")
st_touches = _pair_udf("touches")
st_crosses = _pair_udf("crosses")
st_overlaps = _pair_udf("overlaps")
st_equals = _pair_udf("equals")


@F.pandas_udf(DoubleType())
def st_area(wkt: pd.Series) -> pd.Series:
    """Exact planar area (shoelace, exterior minus holes)."""
    return pd.Series(parse_wkt(wkt).areas())


@F.pandas_udf(DoubleType())
def st_length(wkt: pd.Series) -> pd.Series:
    """Planar length of (multi)linestrings; perimeter contribution is
    NOT included for polygons (matches OGR ST_Length on lines)."""
    b = parse_wkt(wkt)
    out = np.full(len(b), np.nan)
    for i in range(len(b)):
        if b.is_null[i]:
            continue
        g = Geometry.from_batch(b, i)
        if g.dim == 1:
            out[i] = sum(
                float(np.linalg.norm(np.diff(ln, axis=0), axis=1).sum()) for ln in g.lines()
            )
        else:
            out[i] = 0.0
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def st_geodesic_area(wkt: pd.Series) -> pd.Series:
    """ST_Area(geom, use_ellipsoid=1): WGS84 geodesic area
    (ogrsqlitesqlfunctions.cpp:636 OGR2SQLITE_ST_GeodesicArea; lon/lat
    EPSG:4326 assumed like the reference's no-SRID default). See
    geom/geodesic.py for the authalic-excess formulation."""
    from gdal_spark.geom.geodesic import geodesic_geometry_area

    b = parse_wkt(wkt)
    out = np.full(len(b), np.nan)
    for i in range(len(b)):
        if not b.is_null[i]:
            gtype, parts = b.geometry(i)
            out[i] = geodesic_geometry_area(gtype, parts)
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def st_geodesic_length(wkt: pd.Series) -> pd.Series:
    """ST_Length(geom, use_ellipsoid=1): WGS84 geodesic length
    (ogrsqlitesqlfunctions.cpp:681; Vincenty fixed-iteration inverse,
    geom/geodesic.py)."""
    from gdal_spark.geom.geodesic import geodesic_geometry_length

    b = parse_wkt(wkt)
    out = np.full(len(b), np.nan)
    for i in range(len(b)):
        if not b.is_null[i]:
            gtype, parts = b.geometry(i)
            out[i] = geodesic_geometry_length(gtype, parts)
    return pd.Series(out)


def _polys_wkt(polys: list) -> str | None:
    from gdal_spark.operators.layer_algebra import _polys_to_wkt

    return _polys_to_wkt(polys, promote=False)


@F.pandas_udf(StringType())
def st_buffer(wkt: pd.Series, dist: pd.Series) -> pd.Series:
    """Round positive buffer (OGRGeometry::Buffer, ogrgeometry.cpp:4949;
    GEOS-style arc discretization, 8 segments per quadrant, vertices
    inscribed in the true circle)."""
    from gdal_spark.geom.ops import buffer

    b = parse_wkt(wkt)
    out = []
    for i in range(len(b)):
        if b.is_null[i]:
            out.append(None)
            continue
        out.append(_polys_wkt(buffer(Geometry.from_batch(b, i), float(dist.iloc[i]))))
    return pd.Series(out, dtype=object)


@F.pandas_udf(StringType())
def st_centroid(wkt: pd.Series) -> pd.Series:
    """Exact centroid (ogrgeometry.cpp:6526): area moments for
    polygons, length-weighted for lines, mean for points."""
    from gdal_spark.geom.ops import centroid

    b = parse_wkt(wkt)
    out = []
    for i in range(len(b)):
        if b.is_null[i]:
            out.append(None)
            continue
        cx, cy = centroid(Geometry.from_batch(b, i))
        out.append(f"POINT ({cx:.15g} {cy:.15g})")
    return pd.Series(out, dtype=object)


@F.pandas_udf(StringType())
def st_convex_hull(wkt: pd.Series) -> pd.Series:
    """Andrew monotone chain (ogrgeometry.cpp:4449)."""
    from gdal_spark.geom.ops import convex_hull

    b = parse_wkt(wkt)
    out = []
    for i in range(len(b)):
        if b.is_null[i]:
            out.append(None)
            continue
        g = Geometry.from_batch(b, i)
        pts = np.concatenate([r for rings in g.parts for r in rings], axis=0)
        hull = convex_hull(pts)
        if len(hull) <= 2:
            out.append(f"POINT ({hull[0][0]:.15g} {hull[0][1]:.15g})")
        else:
            body = ",".join(f"{x:.15g} {y:.15g}" for x, y in hull)
            out.append(f"POLYGON (({body}))")
    return pd.Series(out, dtype=object)


@F.pandas_udf(StringType())
def st_simplify(wkt: pd.Series, tol: pd.Series) -> pd.Series:
    """Douglas-Peucker (ogrgeometry.cpp:6778 Simplify = GEOSSimplify),
    applied per ring / per line part."""
    from gdal_spark.geom.batch import GeomBatchBuilder
    from gdal_spark.geom.ops import simplify_dp
    from gdal_spark.geom.wkt import to_wkt

    b = parse_wkt(wkt)
    out = []
    for i in range(len(b)):
        if b.is_null[i]:
            out.append(None)
            continue
        g = Geometry.from_batch(b, i)
        t = float(tol.iloc[i])
        bb = GeomBatchBuilder()
        if g.dim == 1:
            lines = [simplify_dp(ln, t) for ln in g.lines()]
            if len(lines) == 1:
                bb.add(b.types[i], [[lines[0]]])
            else:
                bb.add(b.types[i], [[ln] for ln in lines])
        elif g.dim == 2:
            parts = [
                [simplify_dp(r, t) for r in rings] for rings in g.parts
            ]
            bb.add(b.types[i], parts)
        else:
            out.append(wkt.iloc[i])
            continue
        out.append(to_wkt(bb.finish())[0])
    return pd.Series(out, dtype=object)


@F.pandas_udf(DoubleType())
def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact min planar distance (ogrgeometry.cpp:3818)."""
    from gdal_spark.geom.ops import distance

    ba = parse_wkt(a)
    bb = parse_wkt(b)
    out = np.full(len(ba), np.nan)
    for i in range(len(ba)):
        if not (ba.is_null[i] or bb.is_null[i]):
            out[i] = distance(Geometry.from_batch(ba, i), Geometry.from_batch(bb, i))
    return pd.Series(out)


@F.pandas_udf(StringType())
def st_make_valid(wkt: pd.Series) -> pd.Series:
    """Even-odd reinterpretation of self-intersecting rings as a valid
    region (ogrgeometry.cpp:4183 MakeValid analog)."""
    from gdal_spark.geom.ops import make_valid

    b = parse_wkt(wkt)
    out = []
    for i in range(len(b)):
        if b.is_null[i]:
            out.append(None)
            continue
        g = Geometry.from_batch(b, i)
        if g.dim != 2:
            out.append(wkt.iloc[i])
        else:
            out.append(_polys_wkt(make_valid(g.rings())))
    return pd.Series(out, dtype=object)


_ALL = {
    "ST_Intersects": st_intersects,
    "ST_Buffer": st_buffer,
    "ST_Centroid": st_centroid,
    "ST_ConvexHull": st_convex_hull,
    "ST_Simplify": st_simplify,
    "ST_Distance": st_distance,
    "ST_MakeValid": st_make_valid,
    "ST_Disjoint": st_disjoint,
    "ST_Within": st_within,
    "ST_Contains": st_contains,
    "ST_Touches": st_touches,
    "ST_Crosses": st_crosses,
    "ST_Overlaps": st_overlaps,
    "ST_Equals": st_equals,
    "ST_Area": st_area,
    "ST_Length": st_length,
    # use_ellipsoid=1 variants: SQL can't overload a pandas UDF by
    # arity, so the 2-arg reference forms register under explicit names
    "ST_GeodesicArea": st_geodesic_area,
    "ST_GeodesicLength": st_geodesic_length,
}


def register_st_functions(spark: SparkSession) -> None:
    """Make the ST_* set callable from spark.sql (the engine's
    'SQLITE dialect' surface, gcore/gdaldataset.cpp:7418)."""
    for name, udf in _ALL.items():
        spark.udf.register(name, udf)
