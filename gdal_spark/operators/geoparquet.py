"""GeoParquet 1.1 sink — WKB geometry column + float32 bbox covering
struct + `geo` footer metadata, executor-written.

Reference: /root/reference/ogr/ogrsf_frmts/parquet/
ogrparquetwriterlayer.cpp:580-755 (GetGeoMetadata) and
ogr/ogrsf_frmts/arrow_common/ograrrowwriterlayer.hpp:

  * footer key "geo": {"version": "1.1.0", "primary_column", columns:
    {<name>: {"encoding": "WKB", "crs": null (no SRS), "bbox":
    [xmin, ymin, xmax, ymax], "covering": {"bbox": {"xmin":
    [<name>_bbox, "xmin"], ...}}, "geometry_types": [...]}}}
    (:585-697; geometry-type strings :713-741, set-ordered by wkb enum).
  * covering column `<name>_bbox`: non-nullable FLOAT32 struct
    xmin/ymin/xmax/ymax (:611-630), values rounded OUTWARD when the
    double does not fit float32 — castToFloatDown/Up multiply by
    1 -/+ 2^-23 and re-cast (:1362-1396).

Distributed shape: Spark's parquet writer cannot attach custom footer
key-values, so each PARTITION writes its own parquet file via pyarrow
inside mapInPandas — exactly the reference's one-footer-per-file
layout, scaled out; the driver never sees row data, only the returned
per-file manifest (path, rows, bbox). The bbox covering column is what
the scan side's row-group skipping (operators/spatial.py PushedFilters
path) prunes on, closing the GeoParquet write->read loop.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gdal_spark.geom.wkt import GeomType, parse_wkt
from gdal_spark.geom.wkb import geom_to_wkb

RNDTOWARDS = 1.0 - 1.0 / 8388608.0
RNDAWAY = 1.0 + 1.0 / 8388608.0

_TYPE_NAMES = {
    GeomType.POINT: "Point",
    GeomType.LINESTRING: "LineString",
    GeomType.POLYGON: "Polygon",
    GeomType.MULTIPOINT: "MultiPoint",
    GeomType.MULTILINESTRING: "MultiLineString",
    GeomType.MULTIPOLYGON: "MultiPolygon",
    GeomType.GEOMETRYCOLLECTION: "GeometryCollection",
}


def cast_to_float_down(d: np.ndarray) -> np.ndarray:
    """castToFloatDown (ograrrowwriterlayer.hpp:1376-1384)."""
    d = np.asarray(d, dtype=np.float64)
    f = d.astype(np.float32)
    over = f.astype(np.float64) > d
    adj = (d * np.where(d < 0, RNDAWAY, RNDTOWARDS)).astype(np.float32)
    return np.where(over, adj, f).astype(np.float32)


def cast_to_float_up(d: np.ndarray) -> np.ndarray:
    """castToFloatUp (:1386-1394)."""
    d = np.asarray(d, dtype=np.float64)
    f = d.astype(np.float32)
    under = f.astype(np.float64) < d
    adj = (d * np.where(d < 0, RNDTOWARDS, RNDAWAY)).astype(np.float32)
    return np.where(under, adj, f).astype(np.float32)


def geo_metadata_json(
    geom_name: str,
    bbox: tuple[float, float, float, float] | None,
    geometry_types: list[str],
) -> str:
    col: dict = {"encoding": "WKB", "crs": None}
    if bbox is not None:
        col["bbox"] = list(bbox)
        col["covering"] = {
            "bbox": {c: [f"{geom_name}_bbox", c] for c in ("xmin", "ymin", "xmax", "ymax")}
        }
    col["geometry_types"] = geometry_types
    return json.dumps(
        {"version": "1.1.0", "primary_column": geom_name, "columns": {geom_name: col}}
    )


def write_geoparquet(
    df: DataFrame,
    path: str,
    wkt_col: str = "wkt",
    geom_name: str = "geometry",
    write_bbox: bool = True,
    num_files: int | None = None,
) -> DataFrame:
    """Write df (attribute columns + a WKT column) as a directory of
    GeoParquet files, one per partition. Returns the manifest
    DataFrame (file, rows, xmin, ymin, xmax, ymax) — bbox in the
    float32-outward covering values actually written."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    if num_files is not None:
        df = df.repartition(num_files)
    attrs = [c for c in df.columns if c != wkt_col]

    def _write(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            yield pd.DataFrame(
                {"file": pd.array([], dtype=object), "rows": pd.array([], dtype="int64"),
                 "xmin": pd.array([], dtype="float64"), "ymin": pd.array([], dtype="float64"),
                 "xmax": pd.array([], dtype="float64"), "ymax": pd.array([], dtype="float64")}
            )
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        batch = parse_wkt(pdf[wkt_col].tolist())
        wkb = geom_to_wkb(batch)
        gtypes: set[int] = set()
        n = len(pdf)
        for i in range(n):
            gt, _parts = batch.geometry(i)
            gtypes.add(int(gt))
        env = np.asarray(batch.envelopes(), dtype=np.float64)
        minx, miny, maxx, maxy = env[:, 0], env[:, 1], env[:, 2], env[:, 3]
        cols = {c: pa.array(pdf[c]) for c in attrs}
        cols[geom_name] = pa.array(wkb, type=pa.binary())
        if write_bbox:
            fxmin = cast_to_float_down(minx)
            fymin = cast_to_float_down(miny)
            fxmax = cast_to_float_up(maxx)
            fymax = cast_to_float_up(maxy)
            cols[f"{geom_name}_bbox"] = pa.StructArray.from_arrays(
                [pa.array(fxmin, type=pa.float32()), pa.array(fymin, type=pa.float32()),
                 pa.array(fxmax, type=pa.float32()), pa.array(fymax, type=pa.float32())],
                names=["xmin", "ymin", "xmax", "ymax"],
            )
            file_bbox = (float(fxmin.min()), float(fymin.min()),
                         float(fxmax.max()), float(fymax.max()))
        else:
            file_bbox = None
        names = [
            _TYPE_NAMES[GeomType(g)] for g in sorted(gtypes) if GeomType(g) in _TYPE_NAMES
        ]
        table = pa.table(cols)
        meta = dict(table.schema.metadata or {})
        meta[b"geo"] = geo_metadata_json(geom_name, file_bbox, names).encode()
        table = table.replace_schema_metadata(meta)
        fname = os.path.join(path, f"part-{pid:05d}.parquet")
        pq.write_table(table, fname)
        yield pd.DataFrame(
            {"file": [fname], "rows": [n],
             "xmin": [file_bbox[0] if file_bbox else float("nan")],
             "ymin": [file_bbox[1] if file_bbox else float("nan")],
             "xmax": [file_bbox[2] if file_bbox else float("nan")],
             "ymax": [file_bbox[3] if file_bbox else float("nan")]}
        )

    return df.mapInPandas(
        _write,
        "file string, rows long, xmin double, ymin double, xmax double, ymax double",
    )
