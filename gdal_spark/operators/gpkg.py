"""GeoPackage (GPKG) IO over stdlib sqlite3 — the reference's flagship
single-file vector container, re-expressed for Spark.

Reference semantics: /root/reference/ogr/ogrsf_frmts/gpkg/ —
ogrgeopackagetablelayer.cpp (feature table scan; the HasSpatialIndex →
R-tree semi-join in generated SQL around line 1659),
ogrgeopackagedatasource.cpp (gpkg_contents / gpkg_geometry_columns /
gpkg_spatial_ref_sys bootstrap), and the GeoPackage Binary (GPB) header
layout implemented in ogrgeopackageutility.cpp (GPkgHeaderFromWKB /
GPkgGeometryToOGR): magic 'GP', version, flags byte (endianness bit 0,
envelope indicator bits 1-3, empty bit 4), int32 srs_id, optional
envelope doubles, then ISO WKB.

Scale design (the part that is NOT a translation):

  * **The fid space IS the split plan.** The driver opens the file
    read-only, reads only `MIN(fid) / MAX(fid) / COUNT(*)`, and cuts
    the id space into ~`rows_per_split` ranges; each executor task
    opens its own immutable read-only connection and SELECTs its
    range — positioned B-tree reads, no driver materialization. This
    is Spark's JDBC partitioned-read shape applied to a file.
  * **Spatial-filter pushdown runs inside SQLite per task**: when the
    file carries the `rtree_<table>_<col>` index (the
    gpkg_rtree_index extension), the per-task query gains the same
    `fid IN (SELECT id FROM rtree_... WHERE maxx >= ? AND ...)`
    semi-join the reference generates — the prune happens in the
    index, features outside the box are never read. Without the
    index, tasks prune decode-free from the GPB envelope header
    before any WKB parse (OGRGeoPackageTableLayer fallback).
  * The sink encodes every GPB blob in EXECUTORS (mapInPandas: WKT →
    GeomBatch → WKB → GPB + envelope); the driver streams the
    fid-sorted iterator into the sqlite file in executemany batches —
    memory bounded by one Arrow batch, same contract as the
    shapefile / PMTiles / COG sinks. The R-tree is populated from the
    streamed envelopes, never from re-reading geometry.
"""

from __future__ import annotations

import os
import sqlite3
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gdal_spark.geom.wkb import geom_to_wkb, wkb_to_geom
from gdal_spark.geom.wkt import parse_wkt, to_wkt

GPKG_APPLICATION_ID = 0x47504B47  # 'GPKG'
GPKG_USER_VERSION = 10300  # GeoPackage 1.3.0


# ---------------------------------------------------------------------------
# GeoPackage Binary (GPB) codec
# ---------------------------------------------------------------------------


def encode_gpb(
    wkb: bytes | None,
    srs_id: int,
    envelope: tuple[float, float, float, float] | None = None,
) -> bytes | None:
    """WKB -> StandardGeoPackageBinary blob (little-endian header).
    `envelope` is (minx, maxx, miny, maxy) per the spec's ordering;
    None geometry -> None (a NULL column value, as the reference
    writes for null geometries)."""
    if wkb is None:
        return None
    empty = len(wkb) <= 5 or envelope is None
    indicator = 0 if empty else 1
    # flags: bit0 byte order (1 = little), bits1-3 envelope indicator,
    # bit4 empty-geometry flag
    flags = 1 | (indicator << 1) | ((1 << 4) if empty else 0)
    head = b"GP" + bytes([0, flags]) + struct.pack("<i", srs_id)
    if indicator == 1:
        head += struct.pack("<4d", *envelope)
    return head + wkb


def decode_gpb(blob: bytes) -> tuple[int, tuple | None, bool, bytes]:
    """GPB blob -> (srs_id, envelope|None, empty_flag, wkb). Validates
    magic/version and supports all envelope indicators (0, 1=XY,
    2=XYZ, 3=XYM, 4=XYZM) and both header byte orders."""
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage binary (missing GP magic)")
    if blob[2] != 0:
        raise ValueError(f"unsupported GPB version {blob[2]}")
    flags = blob[3]
    if flags & 0b00100000:
        raise ValueError("ExtendedGeoPackageBinary not supported")
    bo = "<" if (flags & 1) else ">"
    indicator = (flags >> 1) & 0b111
    empty = bool(flags & 0b10000)
    (srs_id,) = struct.unpack_from(bo + "i", blob, 4)
    n_env = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}.get(indicator)
    if n_env is None:
        raise ValueError(f"invalid GPB envelope indicator {indicator}")
    env = struct.unpack_from(f"{bo}{n_env}d", blob, 8) if n_env else None
    return srs_id, env, empty, blob[8 + 8 * n_env :]


# ---------------------------------------------------------------------------
# Spark <-> SQLite type mapping
# ---------------------------------------------------------------------------

_SPARK_TO_SQLITE = {
    "tinyint": "TINYINT", "smallint": "SMALLINT", "int": "MEDIUMINT",
    "bigint": "INTEGER", "long": "INTEGER", "float": "FLOAT",
    "double": "DOUBLE", "string": "TEXT", "binary": "BLOB",
    "boolean": "BOOLEAN", "date": "DATE", "timestamp": "DATETIME",
}


def _sqlite_to_spark(decl: str) -> str:
    d = decl.upper()
    if d in ("BOOLEAN",):
        return "boolean"
    if d in ("TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER", "BIGINT"):
        return "long"
    if d in ("FLOAT", "DOUBLE", "REAL"):
        return "double"
    if d == "BLOB":
        return "binary"
    return "string"  # TEXT, DATE, DATETIME, anything else


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------


def write_gpkg(
    df: DataFrame,
    path: str,
    table: str = "layer",
    wkt_col: str = "wkt",
    fid_col: str = "fid",
    srs_id: int = 4326,
    geometry_type: str = "GEOMETRY",
    spatial_index: bool = True,
    batch_rows: int = 10_000,
) -> dict:
    """Sink: rows -> a valid GeoPackage file with metadata tables and
    (optionally) the gpkg_rtree_index extension. GPB encode runs in
    executors; the driver streams the fid-sorted iterator into
    sqlite."""
    attr_cols = [
        (f.name, _SPARK_TO_SQLITE.get(f.dataType.simpleString(), "TEXT"))
        for f in df.schema.fields
        if f.name not in (wkt_col, fid_col)
    ]
    names = [n for n, _ in attr_cols]
    wkt_b, fid_b, srs_b = wkt_col, fid_col, srs_id

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            batch = parse_wkt(pdf[wkt_b])
            wkbs = geom_to_wkb(batch)
            env = batch.envelopes()
            blobs, boxes = [], []
            for i in range(len(pdf)):
                if wkbs[i] is None or batch.is_null[i]:
                    blobs.append(None)
                    boxes.append((np.nan,) * 4)
                elif batch.is_empty[i] or not np.isfinite(env[i, 0]):
                    blobs.append(encode_gpb(wkbs[i], srs_b, None))
                    boxes.append((np.nan,) * 4)
                else:
                    e = (
                        float(env[i, 0]), float(env[i, 2]),
                        float(env[i, 1]), float(env[i, 3]),
                    )  # (minx, maxx, miny, maxy) — spec envelope order
                    blobs.append(encode_gpb(wkbs[i], srs_b, e))
                    boxes.append(e)
            out = pd.DataFrame({
                "fid": pdf[fid_b].astype("int64"),
                "gpb": pd.Series(blobs, dtype=object),
                "minx": [b[0] for b in boxes], "maxx": [b[1] for b in boxes],
                "miny": [b[2] for b in boxes], "maxy": [b[3] for b in boxes],
            })
            for n in names:
                out[n] = pdf[n]
            yield out

    schema = (
        "fid long, gpb binary, minx double, maxx double, miny double, maxy double"
    )
    for f in df.schema.fields:
        if f.name in (wkt_col, fid_col):
            continue
        schema += f", {f.name} {f.dataType.simpleString()}"
    enc = df.mapInPandas(_enc, schema).orderBy("fid")

    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute(f"PRAGMA application_id = {GPKG_APPLICATION_ID}")
        cur.execute(f"PRAGMA user_version = {GPKG_USER_VERSION}")
        cur.execute("PRAGMA synchronous = OFF")
        cur.execute("PRAGMA journal_mode = MEMORY")
        _bootstrap_metadata(cur)
        _ensure_srs(cur, srs_id)
        col_ddl = "".join(f', "{n}" {t}' for n, t in attr_cols)
        cur.execute(
            f'CREATE TABLE "{table}" '
            f"(fid INTEGER PRIMARY KEY, geom BLOB{col_ddl})"
        )
        rtree = f"rtree_{table}_geom"
        if spatial_index:
            cur.execute(
                f'CREATE VIRTUAL TABLE "{rtree}" USING '
                "rtree(id, minx, maxx, miny, maxy)"
            )
            cur.execute(
                "INSERT INTO gpkg_extensions VALUES "
                "(?, 'geom', 'gpkg_rtree_index', "
                "'http://www.geopackage.org/spec120/#extension_rtree', "
                "'write-only')",
                (table,),
            )

        ph = ", ".join("?" * (2 + len(names)))
        ins = f'INSERT INTO "{table}" VALUES ({ph})'
        ins_rt = f'INSERT INTO "{rtree}" VALUES (?, ?, ?, ?, ?)'
        nrec = 0
        bbox = [np.inf, np.inf, -np.inf, -np.inf]
        rows_buf: list[tuple] = []
        rt_buf: list[tuple] = []

        def _flush() -> None:
            if rows_buf:
                cur.executemany(ins, rows_buf)
                rows_buf.clear()
            if rt_buf:
                cur.executemany(ins_rt, rt_buf)
                rt_buf.clear()

        for row in enc.toLocalIterator():
            nrec += 1
            vals = [None if pd.isna(v) else v for v in (row[n] for n in names)]
            gpb = row["gpb"]
            rows_buf.append((int(row["fid"]), gpb, *vals))
            if gpb is not None and not np.isnan(row["minx"]):
                bbox[0] = min(bbox[0], row["minx"]); bbox[1] = min(bbox[1], row["miny"])
                bbox[2] = max(bbox[2], row["maxx"]); bbox[3] = max(bbox[3], row["maxy"])
                if spatial_index:
                    rt_buf.append(
                        (int(row["fid"]), row["minx"], row["maxx"],
                         row["miny"], row["maxy"])
                    )
            if len(rows_buf) >= batch_rows:
                _flush()
        _flush()
        ext = [None] * 4 if not np.isfinite(bbox[0]) else bbox
        cur.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
            "min_x, min_y, max_x, max_y, srs_id) VALUES "
            "(?, 'features', ?, ?, ?, ?, ?, ?)",
            (table, table, ext[0], ext[1], ext[2], ext[3], srs_id),
        )
        cur.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', ?, ?, 0, 0)",
            (table, geometry_type, srs_id),
        )
        con.commit()
    finally:
        con.close()
    return {"records": nrec, "table": table, "bbox": tuple(bbox)}


def _bootstrap_metadata(cur: sqlite3.Cursor) -> None:
    """The spec's required metadata tables (reference:
    ogrgeopackagedatasource.cpp CreateMetadataTables)."""
    cur.execute(
        "CREATE TABLE gpkg_spatial_ref_sys ("
        "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
        "organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, "
        "definition TEXT NOT NULL, description TEXT)"
    )
    cur.executemany(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?, ?, ?, ?, ?, NULL)",
        [
            ("Undefined Cartesian SRS", -1, "NONE", -1, "undefined"),
            ("Undefined Geographic SRS", 0, "NONE", 0, "undefined"),
            (
                "WGS 84 geodetic", 4326, "EPSG", 4326,
                'GEOGCS["WGS 84",DATUM["WGS_1984",'
                'SPHEROID["WGS 84",6378137,298.257223563]],'
                'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
            ),
        ],
    )
    cur.execute(
        "CREATE TABLE gpkg_contents ("
        "table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL, "
        "identifier TEXT UNIQUE, description TEXT DEFAULT '', "
        "last_change DATETIME NOT NULL DEFAULT "
        "(strftime('%Y-%m-%dT%H:%M:%fZ','now')), "
        "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, "
        "srs_id INTEGER)"
    )
    cur.execute(
        "CREATE TABLE gpkg_geometry_columns ("
        "table_name TEXT NOT NULL, column_name TEXT NOT NULL, "
        "geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, "
        "z TINYINT NOT NULL, m TINYINT NOT NULL, "
        "CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"
    )
    cur.execute(
        "CREATE TABLE gpkg_extensions ("
        "table_name TEXT, column_name TEXT, extension_name TEXT NOT NULL, "
        "definition TEXT NOT NULL, scope TEXT NOT NULL)"
    )


def _ensure_srs(cur: sqlite3.Cursor, srs_id: int) -> None:
    if srs_id in (-1, 0, 4326):
        return
    cur.execute(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?, ?, 'EPSG', ?, ?, NULL)",
        (f"EPSG:{srs_id}", srs_id, srs_id, f"EPSG:{srs_id}"),
    )


# ---------------------------------------------------------------------------
# scan
# ---------------------------------------------------------------------------


def gpkg_layers(path: str) -> list[str]:
    con = sqlite3.connect(f"file:{path}?mode=ro&immutable=1", uri=True)
    try:
        return [
            r[0]
            for r in con.execute(
                "SELECT table_name FROM gpkg_contents WHERE data_type='features'"
            )
        ]
    finally:
        con.close()


def read_gpkg(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    rows_per_split: int = 100_000,
    bbox: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """Distributed GeoPackage scan: fid-range splits planned from the
    table's id space, per-task read-only sqlite connections, and —
    when `bbox` is given — the reference's R-tree semi-join pushed
    into each task's generated SQL
    (ogrgeopackagetablelayer.cpp:1659 HasSpatialIndex path)."""
    con = sqlite3.connect(f"file:{path}?mode=ro&immutable=1", uri=True)
    try:
        if table is None:
            layers = gpkg_layers(path)
            if not layers:
                raise ValueError(f"{path}: no feature tables in gpkg_contents")
            table = layers[0]
        row = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name=?",
            (table,),
        ).fetchone()
        if row is None:
            raise ValueError(f"{path}: {table} not in gpkg_geometry_columns")
        geom_col = row[0]
        cols = con.execute(f'PRAGMA table_info("{table}")').fetchall()
        pk = next((c[1] for c in cols if c[5] == 1), "rowid")
        attrs = [
            (c[1], _sqlite_to_spark(c[2]))
            for c in cols
            if c[1] not in (geom_col, pk)
        ]
        rtree = f"rtree_{table}_{geom_col}"
        has_rtree = (
            con.execute(
                "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?",
                (rtree,),
            ).fetchone()
            is not None
        )
        lo, hi, cnt = con.execute(
            f'SELECT MIN("{pk}"), MAX("{pk}"), COUNT(*) FROM "{table}"'
        ).fetchone()
    finally:
        con.close()

    schema = "fid long, wkt string" + "".join(f", {n} {t}" for n, t in attrs)
    if cnt == 0 or lo is None:
        return spark.createDataFrame([], schema)
    nsplits = max(1, -(-cnt // rows_per_split))
    step = max(1, -(-(hi - lo + 1) // nsplits))
    ranges = [(lo + i * step, min(hi, lo + (i + 1) * step - 1)) for i in range(nsplits)]
    sdf = spark.createDataFrame(ranges, "fid0 long, fid1 long").repartition(
        len(ranges)
    )

    attr_names = [n for n, _ in attrs]
    sel_cols = ", ".join([f't."{pk}"', f't."{geom_col}"'] + [f't."{n}"' for n in attr_names])
    base_sql = (
        f'SELECT {sel_cols} FROM "{table}" t '
        f'WHERE t."{pk}" BETWEEN ? AND ?'
    )
    params_extra: tuple = ()
    if bbox is not None and has_rtree:
        # the reference's generated semi-join: prune in the R-tree,
        # never touch feature rows outside the filter box
        base_sql += (
            f' AND t."{pk}" IN (SELECT id FROM "{rtree}" '
            "WHERE maxx >= ? AND minx <= ? AND maxy >= ? AND miny <= ?)"
        )
        params_extra = (bbox[0], bbox[2], bbox[1], bbox[3])
    path_b, bbox_b = path, bbox
    sql_b, extra_b = base_sql, params_extra
    rtree_used = bbox is not None and has_rtree

    def _env_miss(blob: bytes) -> bool:
        """Decode-free prune from the GPB envelope header (fallback
        when the file has no R-tree)."""
        if bbox_b is None or rtree_used:
            return False
        try:
            _, env, empty, wkb = decode_gpb(blob)
        except ValueError:
            return False
        if empty:
            return True  # spatial filter excludes empty geometries
        if env is None:
            b = wkb_to_geom([wkb])
            e = b.envelopes()[0]
            env = (e[0], e[2], e[1], e[3])
        return (
            env[1] < bbox_b[0] or env[0] > bbox_b[2]
            or env[3] < bbox_b[1] or env[2] > bbox_b[3]
        )

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        con = sqlite3.connect(f"file:{path_b}?mode=ro&immutable=1", uri=True)
        try:
            for pdf in batches:
                for f0, f1 in pdf[["fid0", "fid1"]].itertuples(index=False):
                    rows = con.execute(
                        sql_b, (int(f0), int(f1), *extra_b)
                    ).fetchall()
                    fids, blobs, attr_vals = [], [], []
                    for r in rows:
                        if r[1] is None:
                            # a spatial filter excludes null geometries
                            # (ogrlayer.cpp FilterGeometry semantics),
                            # matching the R-tree path where null rows
                            # are absent from the index
                            if bbox_b is not None:
                                continue
                        elif _env_miss(r[1]):
                            continue
                        fids.append(r[0])
                        blobs.append(
                            decode_gpb(r[1])[3] if r[1] is not None else None
                        )
                        attr_vals.append(r[2:])
                    wkts = to_wkt(wkb_to_geom(blobs))
                    out = pd.DataFrame({
                        "fid": pd.Series(fids, dtype="int64"),
                        "wkt": pd.Series(wkts, dtype=object),
                    })
                    for j, n in enumerate(attr_names):
                        out[n] = pd.Series(
                            [a[j] for a in attr_vals], dtype=object
                        )
                    yield out
        finally:
            con.close()

    return sdf.mapInPandas(_scan, schema)
