"""ESRI Shapefile IO (.shp / .shx / .dbf) — the reference's flagship
vector format, re-expressed for Spark.

Reference semantics: /root/reference/ogr/ogrsf_frmts/shape/ —
shape2ogr.cpp (SHPReadOGRObject type dispatch, the CW-shell /
CCW-hole ring organization around line 280), shapelib/shpopen.c
(record framing: big-endian 8-byte record headers, content lengths in
16-bit words), shapelib/dbfopen.c (dBASE III header + fixed-width
records), ogrshapelayer.cpp (FID == record index, layer-wide geometry
type).

Scale design (the part that is NOT a translation):

  * **The .shx index IS the split plan.** Each .shx entry is 8 bytes
    (offset, content length); a 10^9-record shapefile has an 8 GB .shp
    but only an 8-byte-per-record index. The driver reads ONLY .shx,
    groups consecutive records into ~`split_bytes` byte-range splits,
    and parallelizes the splits — executors do positioned reads of
    their .shp slice and their .dbf stripe (records are fixed-width,
    so a fid range maps to one contiguous byte range with no index at
    all). This mirrors what the reference's random-access API enables
    on one core, turned into a partitioning scheme.
  * Geometry decode is batch-numpy into the engine's GeomBatch; WKT
    out via the canonical to_wkt writer, so shapefile rows are
    indistinguishable from any other source downstream.
  * The sink encodes every record's .shp payload and .dbf record in
    EXECUTORS (mapInPandas); the driver streams the fid-sorted
    iterator and only stitches running offsets into the record
    headers — memory bounded by one partition (same contract as the
    PMTiles / COG sinks).

Z/M variants: *Z types round-trip Z (WKT `POINT Z (...)` etc.); *M
types and the optional trailing M block of *Z records round-trip as
measures (WKT `POINT M (...)` / `POINT ZM (...)`), the XYM/XYZM
dispatch of SHPReadOGRObject / SHPWriteOGRObject (shape2ogr.cpp ~280)
under shapelib's length-based bMeasureIsUsed test. A Z-only geometry
writes NO M block, so it reads back Z, not ZM-with-zeros.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gdal_spark.geom.batch import GeomBatchBuilder, GeomType
from gdal_spark.geom.wkt import parse_wkt, parse_wkt_m, parse_wkt_z, to_wkt, _fmt_d

# shapefile type codes (shapelib/shapefil.h)
SHPT_NULL = 0
SHPT_POINT, SHPT_ARC, SHPT_POLYGON, SHPT_MULTIPOINT = 1, 3, 5, 8
SHPT_POINTZ, SHPT_ARCZ, SHPT_POLYGONZ, SHPT_MULTIPOINTZ = 11, 13, 15, 18
SHPT_POINTM, SHPT_ARCM, SHPT_POLYGONM, SHPT_MULTIPOINTM = 21, 23, 25, 28

_Z_TYPES = {SHPT_POINTZ, SHPT_ARCZ, SHPT_POLYGONZ, SHPT_MULTIPOINTZ}
_M_TYPES = {SHPT_POINTM, SHPT_ARCM, SHPT_POLYGONM, SHPT_MULTIPOINTM}
_BASE = {
    SHPT_POINTZ: SHPT_POINT, SHPT_ARCZ: SHPT_ARC,
    SHPT_POLYGONZ: SHPT_POLYGON, SHPT_MULTIPOINTZ: SHPT_MULTIPOINT,
    SHPT_POINTM: SHPT_POINT, SHPT_ARCM: SHPT_ARC,
    SHPT_POLYGONM: SHPT_POLYGON, SHPT_MULTIPOINTM: SHPT_MULTIPOINT,
}


# ---------------------------------------------------------------------------
# geometry payload codecs (record content, excluding the 8-byte record header)
# ---------------------------------------------------------------------------


def _signed_area2(ring: np.ndarray) -> float:
    """2x shoelace signed area; >0 = counter-clockwise."""
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _bbox(coords: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(coords[:, 0].min()), float(coords[:, 1].min()),
        float(coords[:, 0].max()), float(coords[:, 1].max()),
    )


def encode_shp_geometry(gtype: GeomType, parts: list[list[np.ndarray]]) -> bytes:
    """WKT-model geometry -> shapefile record content (XY only).
    Polygon rings are re-oriented to the format's rule: shells
    clockwise, holes counter-clockwise (shape2ogr.cpp writes via
    SHPRewindObject); multipolygons flatten to one multi-ring record."""
    if not parts:
        return struct.pack("<i", SHPT_NULL)
    if gtype == GeomType.POINT:
        p = parts[0][0][0]
        return struct.pack("<idd", SHPT_POINT, float(p[0]), float(p[1]))
    if gtype == GeomType.MULTIPOINT:
        pts = np.concatenate([pt[0] for pt in parts])
        out = struct.pack("<i4d", SHPT_MULTIPOINT, *_bbox(pts))
        out += struct.pack("<i", len(pts)) + pts.astype("<f8").tobytes()
        return out
    if gtype in (GeomType.LINESTRING, GeomType.MULTILINESTRING):
        lines = [part[0] for part in parts]
        return _encode_multipart(SHPT_ARC, lines)
    if gtype in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
        rings = []
        for part in parts:  # part = one polygon: [shell, hole...]
            for k, ring in enumerate(part):
                r = np.asarray(ring, dtype=np.float64)
                ccw = _signed_area2(r) > 0
                want_ccw = k > 0  # shells CW, holes CCW
                rings.append(r[::-1] if ccw != want_ccw else r)
        return _encode_multipart(SHPT_POLYGON, rings)
    raise ValueError(f"shapefile cannot store geometry type {gtype!r}")


def _encode_multipart(shp_type: int, runs: list[np.ndarray]) -> bytes:
    coords = np.concatenate(runs)
    out = struct.pack("<i4d", shp_type, *_bbox(coords))
    starts, n = [], 0
    for r in runs:
        starts.append(n)
        n += len(r)
    out += struct.pack("<ii", len(runs), n)
    out += np.asarray(starts, dtype="<i4").tobytes()
    out += coords.astype("<f8").tobytes()
    return out


def _point_in_ring(x: float, y: float, ring: np.ndarray) -> bool:
    """Even-odd ray cast (the containment test shape2ogr.cpp's ring
    organization relies on; orientation-independent)."""
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cross = (y0 > y) != (y1 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
    return bool(np.count_nonzero(cross & (x < xs[: len(cross)])) % 2)


def organize_rings(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Flat shapefile rings -> polygons ([shell, holes...] lists).
    CW rings are shells; CCW rings become holes of the shell whose
    interior contains their first vertex (shape2ogr.cpp:305 'surely
    outer ring' fast path + containment assignment). A CCW ring inside
    no shell is promoted to its own shell (reference tolerates such
    files); a file with no CW ring at all treats the first ring as
    the shell (the QGIS<=3.28 writer bug path, shape2ogr.cpp:333)."""
    if len(rings) == 1:
        return [[rings[0]]]
    shells = [r for r in rings if _signed_area2(r) <= 0]
    holes = [r for r in rings if _signed_area2(r) > 0]
    if not shells:
        return [[rings[0], *rings[1:]]]
    polys: list[list[np.ndarray]] = [[s] for s in shells]
    for h in holes:
        hit = None
        for i, s in enumerate(shells):
            if _point_in_ring(float(h[0, 0]), float(h[0, 1]), s):
                hit = i
                break
        if hit is None:
            polys.append([h[::-1]])
        else:
            polys[hit].append(h)
    return polys


def decode_shp_geometry(content: bytes):
    """Record content -> (base_type_code, parts, z_parts | None,
    m_parts | None) in the WKT model (parts = [part -> [ring ->
    (k,2)]]). M values are read when the shape type declares them —
    the *M types always, the *Z types when the optional trailing M
    block is present (shapelib's bMeasureIsUsed length test;
    shape2ogr.cpp SHPReadOGRObject sets M for XYM/XYZM the same
    way)."""
    (code,) = struct.unpack_from("<i", content, 0)
    if code == SHPT_NULL:
        return SHPT_NULL, [], None, None
    base = _BASE.get(code, code)
    has_z = code in _Z_TYPES
    is_m_type = code in _M_TYPES

    if base == SHPT_POINT:
        x, y = struct.unpack_from("<dd", content, 4)
        z = struct.unpack_from("<d", content, 20)[0] if has_z else None
        mval = None
        if is_m_type:
            mval = struct.unpack_from("<d", content, 20)[0]
        elif has_z and len(content) >= 36:
            mval = struct.unpack_from("<d", content, 28)[0]
        return (
            base, [[np.array([[x, y]])]],
            ([[np.array([z])]] if has_z else None),
            ([[np.array([mval])]] if mval is not None else None),
        )

    if base == SHPT_MULTIPOINT:
        (n,) = struct.unpack_from("<i", content, 36)
        pts = np.frombuffer(content, "<f8", n * 2, 40).reshape(n, 2)
        zp = None
        moff = None
        if has_z:
            zoff = 40 + n * 16 + 16  # points + zmin/zmax
            zs = np.frombuffer(content, "<f8", n, zoff)
            zp = [[np.array([z])] for z in zs]
            if len(content) >= zoff + n * 8 + 16 + n * 8:
                moff = zoff + n * 8 + 16
        elif is_m_type:
            moff = 40 + n * 16 + 16
        mp = None
        if moff is not None:
            ms = np.frombuffer(content, "<f8", n, moff)
            mp = [[np.array([v])] for v in ms]
        return base, [[pts[i : i + 1]] for i in range(n)], zp, mp

    if base in (SHPT_ARC, SHPT_POLYGON):
        nparts, npoints = struct.unpack_from("<ii", content, 36)
        starts = np.frombuffer(content, "<i4", nparts, 44)
        coff = 44 + nparts * 4
        pts = np.frombuffer(content, "<f8", npoints * 2, coff).reshape(npoints, 2)
        ends = np.append(starts[1:], npoints)
        runs = [pts[s:e] for s, e in zip(starts, ends)]
        zruns = None
        moff = None
        if has_z:
            zoff = coff + npoints * 16 + 16
            zs = np.frombuffer(content, "<f8", npoints, zoff)
            zruns = [zs[s:e] for s, e in zip(starts, ends)]
            if len(content) >= zoff + npoints * 8 + 16 + npoints * 8:
                moff = zoff + npoints * 8 + 16
        elif is_m_type:
            moff = coff + npoints * 16 + 16
        mruns = None
        if moff is not None:
            ms = np.frombuffer(content, "<f8", npoints, moff)
            mruns = [ms[s:e] for s, e in zip(starts, ends)]
        if base == SHPT_ARC:
            return (
                base, [[r] for r in runs],
                ([[z] for z in zruns] if zruns is not None else None),
                ([[v] for v in mruns] if mruns is not None else None),
            )
        # polygon: organize flat rings into shells+holes; Z/M polygons
        # keep ring order (organize_rings may reorder, so measured
        # variants use the flat ring list as one part — matches the
        # reference's 'Z not handled correctly' caveat,
        # shape2ogr.cpp:289)
        if zruns is not None or mruns is not None:
            return (
                base, [runs],
                [zruns] if zruns is not None else None,
                [mruns] if mruns is not None else None,
            )
        return base, organize_rings(runs), None, None
    raise ValueError(f"unsupported shapefile shape type {code}")


# decoded parts -> WKT-model geometry type (multi iff multi-part)
GT_OF_CODE_MAP = {
    SHPT_POINT: lambda p: GeomType.POINT,
    SHPT_MULTIPOINT: lambda p: GeomType.MULTIPOINT,
    SHPT_ARC: lambda p: GeomType.LINESTRING if len(p) == 1 else GeomType.MULTILINESTRING,
    SHPT_POLYGON: lambda p: GeomType.POLYGON if len(p) == 1 else GeomType.MULTIPOLYGON,
}


_WKT_NAME = {
    SHPT_POINT: ("POINT", "MULTIPOINT"),
    SHPT_ARC: ("LINESTRING", "MULTILINESTRING"),
    SHPT_POLYGON: ("POLYGON", "MULTIPOLYGON"),
    SHPT_MULTIPOINT: ("MULTIPOINT", "MULTIPOINT"),
}


def _wkt_zm(base: int, parts, zparts, mparts) -> str:
    """Z / M / ZM-variant WKT (manual formatting — GeomBatch is XY).
    The extra columns print in WKT order: x y [z] [m]."""
    tok = ("Z" if zparts is not None else "") + ("M" if mparts is not None else "")

    def vals(i_part, i_ring, k):
        out = []
        if zparts is not None:
            out.append(zparts[i_part][i_ring][k])
        if mparts is not None:
            out.append(mparts[i_part][i_ring][k])
        return "".join(f" {_fmt_d(v)}" for v in out)

    def ring_txt(i_part, i_ring, ring):
        return "(" + ", ".join(
            f"{_fmt_d(x)} {_fmt_d(y)}" + vals(i_part, i_ring, k)
            for k, (x, y) in enumerate(ring)
        ) + ")"

    if base == SHPT_POINT:
        x, y = parts[0][0][0]
        return f"POINT {tok} ({_fmt_d(x)} {_fmt_d(y)}{vals(0, 0, 0)})"
    if base == SHPT_MULTIPOINT:
        items = ", ".join(
            f"({_fmt_d(p[0][0, 0])} {_fmt_d(p[0][0, 1])}{vals(i, 0, 0)})"
            for i, p in enumerate(parts)
        )
        return f"MULTIPOINT {tok} ({items})"
    if base == SHPT_ARC:
        if len(parts) == 1:
            return f"LINESTRING {tok} " + ring_txt(0, 0, parts[0][0])
        return f"MULTILINESTRING {tok} (" + ", ".join(
            ring_txt(i, 0, p[0]) for i, p in enumerate(parts)
        ) + ")"
    # polygon Z/M: single part, flat rings
    return f"POLYGON {tok} (" + ", ".join(
        ring_txt(0, j, r) for j, r in enumerate(parts[0])
    ) + ")"


# ---------------------------------------------------------------------------
# dBASE III (.dbf)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DbfField:
    name: str
    ftype: str  # C N F L D
    length: int
    decimals: int = 0

    @property
    def spark_type(self) -> str:
        if self.ftype == "C" or self.ftype == "D":
            return "string"
        if self.ftype == "L":
            return "boolean"
        if self.ftype in ("F",) or self.decimals > 0:
            return "double"
        return "long"


def encode_dbf_header(fields: list[DbfField], nrecords: int) -> bytes:
    """dBASE III header + field descriptors (dbfopen.c DBFCreateEx)."""
    rec_size = 1 + sum(f.length for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<B3BIHH20x", 0x03, 95, 7, 26, nrecords, hdr_size, rec_size)
    for f in fields:
        name = f.name.encode("ascii", "replace")[:11]
        out += name + b"\x00" * (11 - len(name))
        out += f.ftype.encode("ascii")
        out += b"\x00" * 4
        out += struct.pack("<BB", f.length, f.decimals)
        out += b"\x00" * 14
    out += b"\x0d"
    return bytes(out)


def decode_dbf_header(buf: bytes) -> tuple[int, int, int, list[DbfField]]:
    """-> (nrecords, header_size, record_size, fields)."""
    nrec, hdr_size, rec_size = struct.unpack_from("<IHH", buf, 4)
    fields = []
    off = 32
    while off < hdr_size - 1 and buf[off] != 0x0D:
        # descriptor layout (dbfopen.c): 11 name, 1 type, 4 reserved,
        # 1 length, 1 decimals, 14 reserved
        name = buf[off : off + 11].split(b"\x00", 1)[0].decode("ascii", "replace")
        ftype = chr(buf[off + 11])
        length, decimals = buf[off + 16], buf[off + 17]
        fields.append(DbfField(name, ftype, length, decimals))
        off += 32
    return nrec, hdr_size, rec_size, fields


def encode_dbf_record(fields: list[DbfField], values) -> bytes:
    out = bytearray(b" ")  # not-deleted flag
    for f, v in zip(fields, values):
        if f.ftype == "C" or f.ftype == "D":
            s = ("" if v is None else str(v)).encode("utf-8", "replace")[: f.length]
            out += s + b" " * (f.length - len(s))
        elif f.ftype == "L":
            out += b"?" if v is None else (b"T" if v else b"F")
        else:  # N / F: right-justified
            if v is None:
                s = b""
            elif f.decimals > 0 or f.ftype == "F":
                s = f"{float(v):.{f.decimals}f}".encode()
            else:
                s = str(int(v)).encode()
            if len(s) > f.length:
                s = s[-f.length :]
            out += b" " * (f.length - len(s)) + s
    return bytes(out)


def decode_dbf_values(rec: bytes, fields: list[DbfField]):
    vals, off = [], 1
    for f in fields:
        raw = rec[off : off + f.length]
        off += f.length
        txt = raw.decode("utf-8", "replace").strip()
        if f.ftype == "L":
            vals.append(None if txt in ("", "?") else txt in ("T", "t", "Y", "y"))
        elif f.ftype in ("C", "D"):
            vals.append(txt if txt else None)
        elif not txt or txt == "*" * len(txt):
            vals.append(None)
        elif f.decimals > 0 or f.ftype == "F":
            vals.append(float(txt))
        else:
            try:
                vals.append(int(txt))
            except ValueError:
                vals.append(int(float(txt)))
    return vals


# ---------------------------------------------------------------------------
# file-level framing
# ---------------------------------------------------------------------------


def _main_header(shp_type: int, file_words: int, bbox) -> bytes:
    minx, miny, maxx, maxy = bbox
    return (
        struct.pack(">i5i i", 9994, 0, 0, 0, 0, 0, file_words)
        + struct.pack("<ii", 1000, shp_type)
        + struct.pack("<8d", minx, miny, maxx, maxy, 0, 0, 0, 0)
    )


def read_shx(buf: bytes) -> np.ndarray:
    """.shx bytes -> (n, 2) int64 [byte_offset, content_bytes] per fid."""
    n = (len(buf) - 100) // 8
    arr = np.frombuffer(buf, ">i4", n * 2, 100).reshape(n, 2).astype(np.int64)
    return arr * 2  # words -> bytes


# ---------------------------------------------------------------------------
# Spark scan
# ---------------------------------------------------------------------------


def shapefile_schema(path: str) -> tuple[list[DbfField], str]:
    dbf = os.path.splitext(path)[0] + ".dbf"
    fields: list[DbfField] = []
    if os.path.exists(dbf):
        with open(dbf, "rb") as fh:
            head = fh.read(32)
            _, hdr_size, _ = struct.unpack_from("<IHH", head, 4)
            fh.seek(0)
            _, _, _, fields = decode_dbf_header(fh.read(hdr_size))
    schema = "fid long, wkt string" + "".join(
        f", {f.name} {f.spark_type}" for f in fields
    )
    return fields, schema


def read_shapefile(
    spark: SparkSession,
    path: str,
    split_bytes: int = 8 << 20,
    bbox: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """Distributed shapefile scan: .shx-planned byte-range splits, one
    positioned read per task for the .shp slice and the .dbf stripe.
    `bbox` prunes splits on the driver using per-record .shx extents
    read lazily per split (records outside still parse-skip via their
    stored bounding boxes, OGRShapeLayer::ScanIndices semantics)."""
    base = os.path.splitext(path)[0]
    with open(base + ".shx", "rb") as fh:
        idx = read_shx(fh.read())
    fields, schema = shapefile_schema(path)
    n = len(idx)

    # group consecutive records into byte-budget splits
    splits = []
    i = 0
    while i < n:
        j, acc = i, 0
        while j < n and (j == i or acc + idx[j, 1] <= split_bytes):
            acc += int(idx[j, 1])
            j += 1
        splits.append((i, j, int(idx[i, 0]), int(idx[j - 1, 0] + 8 + idx[j - 1, 1])))
        i = j
    sdf = spark.createDataFrame(
        splits, "fid0 long, fid1 long, byte0 long, byte1 long"
    ).repartition(max(len(splits), 1))

    fields_b = fields
    path_b = path
    bbox_b = bbox

    def _bbox_skip(content: bytes) -> bool:
        """True if the record's stored extent misses the filter bbox —
        decode-free prune (OGRShapeLayer::ScanIndices semantics: cut
        candidates before materializing features)."""
        if bbox_b is None:
            return False
        (code,) = struct.unpack_from("<i", content, 0)
        if code == SHPT_NULL:
            # a spatial filter excludes null-geometry features
            # (ogrlayer.cpp FilterGeometry: null/empty -> FALSE)
            return True
        if _BASE.get(code, code) == SHPT_POINT:
            x, y = struct.unpack_from("<dd", content, 4)
            minx, miny, maxx, maxy = x, y, x, y
        else:
            minx, miny, maxx, maxy = struct.unpack_from("<4d", content, 4)
        return (
            maxx < bbox_b[0] or minx > bbox_b[2]
            or maxy < bbox_b[1] or miny > bbox_b[3]
        )

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dbf_path = os.path.splitext(path_b)[0] + ".dbf"
        have_dbf = os.path.exists(dbf_path) and fields_b
        for pdf in batches:
            for fid0, fid1, b0, b1 in pdf.itertuples(index=False):
                with open(path_b, "rb") as fh:
                    fh.seek(b0)
                    blob = fh.read(b1 - b0)
                recs = []
                if have_dbf:
                    with open(dbf_path, "rb") as fh:
                        head = fh.read(32)
                        _, hdr_size, rec_size = struct.unpack_from("<IHH", head, 4)
                        fh.seek(hdr_size + fid0 * rec_size)
                        stripe = fh.read((fid1 - fid0) * rec_size)
                rows = []
                builder = GeomBatchBuilder()
                zrows: dict[int, str] = {}
                off = 0
                for fid in range(fid0, fid1):
                    (clen,) = struct.unpack_from(">i", blob, off + 4)
                    content = blob[off + 8 : off + 8 + clen * 2]
                    off += 8 + clen * 2
                    if _bbox_skip(content):
                        continue
                    code, parts, zparts, mparts = decode_shp_geometry(content)
                    if zparts is not None or mparts is not None:
                        zrows[len(rows)] = _wkt_zm(code, parts, zparts, mparts)
                        builder.add_null()
                    elif not parts:
                        builder.add_null()
                    else:
                        gt = {
                            SHPT_POINT: GeomType.POINT,
                            SHPT_MULTIPOINT: GeomType.MULTIPOINT,
                            SHPT_ARC: (
                                GeomType.LINESTRING if len(parts) == 1 else GeomType.MULTILINESTRING
                            ),
                            SHPT_POLYGON: (
                                GeomType.POLYGON if len(parts) == 1 else GeomType.MULTIPOLYGON
                            ),
                        }[code]
                        builder.add(gt, parts)
                    if have_dbf:
                        rec = stripe[(fid - fid0) * rec_size : (fid - fid0 + 1) * rec_size]
                        rows.append([fid, *decode_dbf_values(rec, fields_b)])
                    else:
                        rows.append([fid])
                wkts = to_wkt(builder.finish())
                for k, zw in zrows.items():
                    wkts[k] = zw
                names = ["fid"] + ([f.name for f in fields_b] if have_dbf else [])
                if rows:
                    out = pd.DataFrame(rows, columns=names)
                else:
                    out = pd.DataFrame({c: [] for c in names})
                out.insert(1, "wkt", pd.Series(wkts, dtype=object))
                yield out

    return sdf.mapInPandas(_scan, schema)


# ---------------------------------------------------------------------------
# Spark sink
# ---------------------------------------------------------------------------


def infer_dbf_fields(df: DataFrame, exclude: tuple[str, ...] = ("fid", "wkt")) -> list[DbfField]:
    fields = []
    for f in df.schema.fields:
        if f.name in exclude:
            continue
        t = f.dataType.simpleString()
        if t in ("int", "bigint", "smallint", "tinyint"):
            fields.append(DbfField(f.name, "N", 18, 0))
        elif t in ("double", "float"):
            fields.append(DbfField(f.name, "N", 24, 15))
        elif t == "boolean":
            fields.append(DbfField(f.name, "L", 1, 0))
        else:
            fields.append(DbfField(f.name, "C", 80, 0))
    return fields


def write_shapefile(
    df: DataFrame,
    path: str,
    wkt_col: str = "wkt",
    fid_col: str = "fid",
    fields: list[DbfField] | None = None,
) -> dict:
    """Sink: fid-dense rows -> .shp/.shx/.dbf triple. Record payloads
    (geometry content + dbf record) encode in executors; the driver
    streams the fid-sorted iterator stitching running word offsets
    (bounded by one partition, like the PMTiles/COG sinks). FIDs must
    be 0..n-1 (the format is positional — shpopen.c record index)."""
    if fields is None:
        fields = infer_dbf_fields(df, exclude=(fid_col, wkt_col))
    attr_cols = [f.name for f in fields]
    fields_b, wkt_b, fid_b = fields, wkt_col, fid_col

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            batch = parse_wkt(pdf[wkt_b])
            zlists = None
            mlists = None
            payloads, dbf_recs, codes, boxes = [], [], [], []
            for i in range(len(pdf)):
                w = pdf[wkt_b].iloc[i]
                ws = str(w) if w is not None else ""
                has_zm = " ZM " in ws or " ZM(" in ws
                has_z = has_zm or " Z " in ws or " Z(" in ws
                has_m = has_zm or " M " in ws or " M(" in ws
                if w is not None and (has_z or has_m):
                    if has_z and zlists is None:
                        zlists = parse_wkt_z(pdf[wkt_b])
                    if has_m and mlists is None:
                        mlists = parse_wkt_m(pdf[wkt_b])
                    gt, parts = batch.geometry(i)
                    payload = _encode_zm_record(
                        gt, parts,
                        zlists[i] if has_z else None,
                        mlists[i] if has_m else None,
                    )
                else:
                    gt, parts = batch.geometry(i)
                    payload = encode_shp_geometry(gt, parts)
                payloads.append(payload)
                codes.append(struct.unpack_from("<i", payload, 0)[0])
                if len(payload) > 12:
                    minx, miny = struct.unpack_from("<dd", payload, 4)
                    if codes[-1] in (SHPT_POINT, SHPT_POINTZ, SHPT_POINTM):
                        boxes.append((minx, miny, minx, miny))
                    else:
                        maxx, maxy = struct.unpack_from("<dd", payload, 20)
                        boxes.append((minx, miny, maxx, maxy))
                else:
                    boxes.append((np.nan,) * 4)
                vals = [pdf[c].iloc[i] if c in pdf else None for c in attr_cols]
                vals = [None if (isinstance(v, float) and np.isnan(v)) else v for v in vals]
                dbf_recs.append(encode_dbf_record(fields_b, vals))
            yield pd.DataFrame({
                "fid": pdf[fid_b].astype("int64"),
                "payload": payloads,
                "dbf_rec": dbf_recs,
                "code": codes,
                "minx": [b[0] for b in boxes], "miny": [b[1] for b in boxes],
                "maxx": [b[2] for b in boxes], "maxy": [b[3] for b in boxes],
            })

    enc = df.mapInPandas(
        _enc,
        "fid long, payload binary, dbf_rec binary, code int, "
        "minx double, miny double, maxx double, maxy double",
    ).orderBy("fid")

    base = os.path.splitext(path)[0]
    shp_rows, shx_entries, dbf_chunks = [], [], []
    shape_type, bbox, nrec = SHPT_NULL, [np.inf, np.inf, -np.inf, -np.inf], 0
    offset_words = 50
    with open(base + ".shp.tmp", "wb") as shp:
        shp.write(b"\x00" * 100)  # header rewritten after the stream
        for row in enc.toLocalIterator():
            nrec += 1
            content = row["payload"]
            words = len(content) // 2
            shp.write(struct.pack(">ii", nrec, words) + content)
            shx_entries.append((offset_words, words))
            offset_words += 4 + words
            if row["code"] != SHPT_NULL:
                shape_type = shape_type or row["code"]
                if not np.isnan(row["minx"]):
                    bbox[0] = min(bbox[0], row["minx"]); bbox[1] = min(bbox[1], row["miny"])
                    bbox[2] = max(bbox[2], row["maxx"]); bbox[3] = max(bbox[3], row["maxy"])
            dbf_chunks.append(row["dbf_rec"])
    if not np.isfinite(bbox[0]):
        bbox = [0.0, 0.0, 0.0, 0.0]
    hdr = _main_header(shape_type, offset_words, bbox)
    with open(base + ".shp.tmp", "r+b") as fh:
        fh.write(hdr)
    os.replace(base + ".shp.tmp", base + ".shp")
    with open(base + ".shx", "wb") as fh:
        fh.write(_main_header(shape_type, 50 + 4 * nrec, bbox))
        fh.write(np.asarray(shx_entries, dtype=">i4").tobytes())
    with open(base + ".dbf", "wb") as fh:
        fh.write(encode_dbf_header(fields, nrec))
        for rec in dbf_chunks:
            fh.write(rec)
        fh.write(b"\x1a")
    return {"records": nrec, "shape_type": shape_type, "bbox": tuple(bbox)}


def _encode_zm_record(
    gtype: GeomType, parts: list[list[np.ndarray]], zstruct, mstruct
) -> bytes:
    """Encode a measured geometry: XY structure from the GeomBatch
    (which parses Z/M WKT dropping the extra columns), z/m values from
    the parallel parse_wkt_z / parse_wkt_m structures (same part/ring
    shape, value-only arrays). zstruct -> *Z record (trailing M block
    zero-filled, or real when mstruct rides too -> XYZM); mstruct
    alone -> *M record (shape2ogr.cpp SHPWriteOGRObject's
    wkbHasM/wkbHasZ type dispatch)."""
    if (zstruct is None and mstruct is None) or not parts:
        return struct.pack("<i", SHPT_NULL)
    has_z = zstruct is not None
    if gtype == GeomType.POINT:
        x, y = parts[0][0][0]
        mval = float(np.asarray(mstruct[0][0])[0]) if mstruct is not None else 0.0
        if has_z:
            z = float(np.asarray(zstruct[0][0])[0])
            out = struct.pack("<iddd", SHPT_POINTZ, float(x), float(y), z)
            # the optional M slot is written ONLY when measured, so a
            # Z-only point reads back as Z, not ZM-with-zero (OGR's
            # SHPWriteOGRObject does the same wkbHasM dispatch)
            return out + struct.pack("<d", mval) if mstruct is not None else out
        return struct.pack("<iddd", SHPT_POINTM, float(x), float(y), mval)
    rings = [np.asarray(r, dtype=np.float64) for part in parts for r in part]
    xy = np.concatenate(rings)
    nn = len(xy)
    zs = (
        np.concatenate([np.asarray(z, dtype=np.float64) for part in zstruct for z in part])
        if has_z else None
    )
    ms = (
        np.concatenate([np.asarray(v, dtype=np.float64) for part in mstruct for v in part])
        if mstruct is not None else np.zeros(nn)
    )
    code = {
        GeomType.LINESTRING: SHPT_ARCZ if has_z else SHPT_ARCM,
        GeomType.MULTILINESTRING: SHPT_ARCZ if has_z else SHPT_ARCM,
        GeomType.POLYGON: SHPT_POLYGONZ if has_z else SHPT_POLYGONM,
        GeomType.MULTIPOLYGON: SHPT_POLYGONZ if has_z else SHPT_POLYGONM,
        GeomType.MULTIPOINT: SHPT_MULTIPOINTZ if has_z else SHPT_MULTIPOINTM,
    }[gtype]

    def m_block() -> bytes:
        return struct.pack(
            "<2d", float(ms.min()), float(ms.max())
        ) + ms.astype("<f8").tobytes()

    if code in (SHPT_MULTIPOINTZ, SHPT_MULTIPOINTM):
        out = struct.pack("<i4d", code, *_bbox(xy))
        out += struct.pack("<i", nn) + xy.astype("<f8").tobytes()
        if has_z:
            out += struct.pack("<2d", float(zs.min()), float(zs.max())) + zs.astype("<f8").tobytes()
            if mstruct is not None:
                out += m_block()
            return out
        return out + m_block()
    out = struct.pack("<i4d", code, *_bbox(xy))
    starts, acc = [], 0
    for r in rings:
        starts.append(acc)
        acc += len(r)
    out += struct.pack("<ii", len(rings), nn)
    out += np.asarray(starts, dtype="<i4").tobytes()
    out += xy.astype("<f8").tobytes()
    if has_z:
        out += struct.pack("<2d", float(zs.min()), float(zs.max())) + zs.astype("<f8").tobytes()
        # trailing M block ONLY when real measures exist: writing the
        # zero-filled optional block would make a Z-only geometry read
        # back as ZM-with-zero under the length-based M detection
        if mstruct is not None:
            out += m_block()
        return out
    return out + m_block()
