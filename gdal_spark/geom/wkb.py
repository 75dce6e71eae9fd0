"""WKB encode/decode for the flat 2D types.

Semantics: OGRGeometry::importFromWkb / exportToWkb
(/root/reference/ogr/ogrgeometry.cpp:1501,1596; factory
ogrgeometryfactory.cpp:91 createFromWkb). We emit NDR (little-endian,
byte order mark 1) like OGR's default wkbNDR and accept both byte
orders on read (ogr_core.h:624-628).
"""

from __future__ import annotations

import struct

import numpy as np

from gdal_spark.geom.batch import GeomBatch, GeomBatchBuilder, GeomType


class WkbError(ValueError):
    pass


def _encode_one(gtype: GeomType, parts, out: bytearray) -> None:
    out += b"\x01" + struct.pack("<I", int(gtype))
    if gtype == GeomType.POINT:
        out += parts[0][0].astype("<f8").tobytes()
    elif gtype == GeomType.LINESTRING:
        ring = parts[0][0]
        out += struct.pack("<I", len(ring)) + ring.astype("<f8").tobytes()
    elif gtype == GeomType.POLYGON:
        rings = parts[0]
        out += struct.pack("<I", len(rings))
        for r in rings:
            out += struct.pack("<I", len(r)) + r.astype("<f8").tobytes()
    elif gtype in (GeomType.MULTIPOINT, GeomType.MULTILINESTRING, GeomType.MULTIPOLYGON):
        child = {
            GeomType.MULTIPOINT: GeomType.POINT,
            GeomType.MULTILINESTRING: GeomType.LINESTRING,
            GeomType.MULTIPOLYGON: GeomType.POLYGON,
        }[gtype]
        out += struct.pack("<I", len(parts))
        for p in parts:
            _encode_one(child, [p], out)
    elif gtype == GeomType.GEOMETRYCOLLECTION:
        # parts here is [(member_type, rings)] from collection_members
        out += struct.pack("<I", len(parts))
        for mt, rings in parts:
            _encode_one(mt, [rings], out)
    else:
        raise WkbError(f"unsupported type {gtype}")


def geom_to_wkb(batch: GeomBatch) -> list:
    """GeomBatch -> list[bytes|None] (NDR)."""
    out: list[bytes | None] = []
    for i in range(len(batch)):
        if batch.is_null[i]:
            out.append(None)
            continue
        gtype, parts = batch.geometry(i)
        if gtype == GeomType.GEOMETRYCOLLECTION:
            parts = batch.collection_members(i)
        if not parts:
            # OGR writes EMPTY multi-geoms as count=0; empty POINT as NaNs
            if gtype == GeomType.POINT:
                out.append(b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", np.nan, np.nan))
            else:
                out.append(b"\x01" + struct.pack("<I", int(gtype)) + struct.pack("<I", 0))
            continue
        buf = bytearray()
        _encode_one(gtype, parts, buf)
        out.append(bytes(buf))
    return out


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def order(self) -> str:
        b = self.data[self.pos]
        self.pos += 1
        if b == 1:
            return "<"
        if b == 0:
            return ">"
        raise WkbError(f"bad byte order mark {b}")

    def u32(self, bo: str) -> int:
        (v,) = struct.unpack_from(bo + "I", self.data, self.pos)
        self.pos += 4
        return v

    def coords(self, bo: str, n: int) -> np.ndarray:
        arr = np.frombuffer(self.data, dtype=bo + "f8", count=2 * n, offset=self.pos)
        self.pos += 16 * n
        return arr.reshape(-1, 2).astype(np.float64)


def _decode_one(rd: _Reader):
    bo = rd.order()
    raw_type = rd.u32(bo)
    # accept ISO (1001, 2001, 3001...) and 0x80000000-flagged Z types,
    # flatten to 2D like wkbFlatten (ogr_core.h:573)
    has_z = bool(raw_type & 0x80000000) or (raw_type % 1000) != raw_type
    flat = (raw_type & 0x7FFFFFFF) % 1000
    ndim = 2 + (1 if has_z else 0)
    # surface subtypes flatten to their containers (wkbTriangle=17 ->
    # polygon; wkbPolyhedralSurface=15 / wkbTIN=16 -> multipolygon),
    # same normalization as the WKT parser
    flat = {17: 3, 15: 6, 16: 6}.get(flat, flat)
    gtype = GeomType(flat)

    def read_run(n: int) -> np.ndarray:
        if ndim == 2:
            return rd.coords(bo, n)
        arr = np.frombuffer(rd.data, dtype=bo + "f8", count=ndim * n, offset=rd.pos)
        rd.pos += 8 * ndim * n
        return arr.reshape(-1, ndim)[:, :2].astype(np.float64)

    if gtype == GeomType.POINT:
        return gtype, [[read_run(1)]], [GeomType.POINT]
    if gtype == GeomType.LINESTRING:
        return gtype, [[read_run(rd.u32(bo))]], [GeomType.LINESTRING]
    if gtype == GeomType.POLYGON:
        nrings = rd.u32(bo)
        return gtype, [[read_run(rd.u32(bo)) for _ in range(nrings)]], [GeomType.POLYGON]
    if gtype in (GeomType.MULTIPOINT, GeomType.MULTILINESTRING, GeomType.MULTIPOLYGON, GeomType.GEOMETRYCOLLECTION):
        n = rd.u32(bo)
        parts, ptypes = [], []
        for _ in range(n):
            _, child_parts, child_ptypes = _decode_one(rd)
            parts.extend(child_parts)
            ptypes.extend(child_ptypes)
        return gtype, parts, ptypes
    raise WkbError(f"unsupported wkb type {raw_type}")


def wkb_to_geom(blobs) -> GeomBatch:
    """Iterable of bytes|None -> GeomBatch."""
    builder = GeomBatchBuilder()
    for b in blobs:
        if b is None:
            builder.add_null()
            continue
        gtype, parts, ptypes = _decode_one(_Reader(bytes(b)))
        if not parts:
            builder.add_empty(gtype)
        elif gtype == GeomType.GEOMETRYCOLLECTION:
            builder.add_collection(list(zip(ptypes, parts)))
        else:
            builder.add(gtype, parts)
    return builder.finish()
