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
from pyspark.sql.types import BooleanType, DoubleType

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


_ALL = {
    "ST_Intersects": st_intersects,
    "ST_Disjoint": st_disjoint,
    "ST_Within": st_within,
    "ST_Contains": st_contains,
    "ST_Touches": st_touches,
    "ST_Crosses": st_crosses,
    "ST_Overlaps": st_overlaps,
    "ST_Equals": st_equals,
    "ST_Area": st_area,
    "ST_Length": st_length,
}


def register_st_functions(spark: SparkSession) -> None:
    """Make the ST_* set callable from spark.sql (the engine's
    'SQLITE dialect' surface, gcore/gdaldataset.cpp:7418)."""
    for name, udf in _ALL.items():
        spark.udf.register(name, udf)
