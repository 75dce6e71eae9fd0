"""PMTiles v3 archive sink/reader over MVT tile tables.

Format per the reference's vendored spec implementation
(/root/reference/ogr/ogrsf_frmts/pmtiles/pmtiles/pmtiles.hpp) and
writer (/root/reference/ogr/ogrsf_frmts/pmtiles/ogrpmtilesfromtileset.cpp):

  * 127-byte header: "PMTiles" + version 3 + little-endian offset/size
    fields (pmtiles.hpp:54-120 headerv3::serialize).
  * tile ids: per-level Hilbert index + cumulative level offset
    sum(4^t, t < z) (pmtiles.hpp:440-458 zxy_to_tileid; rotate :345).
  * directories: varint-serialized columns — count, delta tile_ids,
    run_lengths, lengths, offsets (0 = contiguous with previous,
    else offset+1) (pmtiles.hpp:463-498 serialize_directory).
  * root/leaf split: root must compress under 16384-127 bytes, else
    entries split into leaves of 4096 (doubling) with the root
    pointing at leaf byte ranges (pmtiles.hpp:572-607
    build_root_leaves / make_root_leaves).
  * file layout: header | root dir | gzip json metadata | leaf dirs |
    tile data (ogrpmtilesfromtileset.cpp:383-422).
  * deduplication: entries for identical content point at the first
    copy's offset; runs of consecutive tile_ids with identical content
    coalesce via run_length; `clustered` = offsets non-decreasing in
    tile_id order (ogrpmtilesfromtileset.cpp:271-314).

Distributed shape: tile payloads (the expensive part) come from the
MVT encoder's distributed pipeline (operators/mvt.py); the archive
itself is a single sequential file, so the sink sorts by tile_id in
Spark (range shuffle) and STREAMS partitions to the writer via
toLocalIterator — driver memory stays bounded by one partition plus
the (small) directory entry list, never the tile data. gzip streams
use mtime=0 so archives are byte-deterministic.
"""

from __future__ import annotations

import gzip
import json
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

HEADER_SIZE = 127
COMPRESSION_NONE = 0x1
COMPRESSION_GZIP = 0x2
TILETYPE_MVT = 0x1


def _rotate(n: int, x: int, y: int, rx: int, ry: int):
    """pmtiles.hpp:345-356."""
    if ry == 0:
        if rx == 1:
            x = n - 1 - x
            y = n - 1 - y
        x, y = y, x
    return x, y


def zxy_to_tileid(z: int, x: int, y: int) -> int:
    """pmtiles.hpp:440-458: cumulative level offset + per-level
    Hilbert d-index."""
    if z > 31:
        raise OverflowError("tile zoom exceeds 64-bit limit")
    if x > (1 << z) - 1 or y > (1 << z) - 1:
        raise OverflowError("tile x/y outside zoom level bounds")
    acc = ((1 << (2 * z)) - 1) // 3  # sum of 4^t for t < z
    n = 1 << z
    d = 0
    tx, ty = x, y
    s = n // 2
    while s > 0:
        rx = 1 if (tx & s) > 0 else 0
        ry = 1 if (ty & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        tx, ty = _rotate(s, tx, ty, rx, ry)
        s //= 2
    return acc + d


def tileid_to_zxy(tileid: int):
    """pmtiles.hpp:417-438."""
    acc = 0
    for z in range(32):
        num = 1 << (2 * z)
        if acc + num > tileid:
            pos = tileid - acc
            n = 1 << z
            tx = ty = 0
            t = pos
            s = 1
            while s < n:
                rx = 1 & (t // 2)
                ry = 1 & (t ^ rx)
                tx, ty = _rotate(s, tx, ty, rx, ry)
                tx += s * rx
                ty += s * ry
                t //= 4
                s *= 2
            return z, tx, ty
        acc += num
    raise OverflowError("tile zoom exceeds 64-bit limit")


def _write_varint(buf: bytearray, v: int):
    while v >= 0x80:
        buf.append((v & 0x7F) | 0x80)
        v >>= 7
    buf.append(v)


def _read_varint(data: bytes, pos: int):
    shift = 0
    val = 0
    while True:
        b = data[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if b < 0x80:
            return val, pos
        shift += 7


def serialize_directory(entries) -> bytes:
    """entries: list of (tile_id, offset, length, run_length) —
    pmtiles.hpp:463-498."""
    buf = bytearray()
    _write_varint(buf, len(entries))
    last = 0
    for tid, _, _, _ in entries:
        _write_varint(buf, tid - last)
        last = tid
    for _, _, _, rl in entries:
        _write_varint(buf, rl)
    for _, _, ln, _ in entries:
        _write_varint(buf, ln)
    for i, (_, off, ln, _) in enumerate(entries):
        if i > 0 and off == entries[i - 1][1] + entries[i - 1][2]:
            _write_varint(buf, 0)
        else:
            _write_varint(buf, off + 1)
    return bytes(buf)


def deserialize_directory(data: bytes):
    n, pos = _read_varint(data, 0)
    tids, rls, lns, offs = [], [], [], []
    last = 0
    for _ in range(n):
        d, pos = _read_varint(data, pos)
        last += d
        tids.append(last)
    for _ in range(n):
        v, pos = _read_varint(data, pos)
        rls.append(v)
    for _ in range(n):
        v, pos = _read_varint(data, pos)
        lns.append(v)
    for i in range(n):
        v, pos = _read_varint(data, pos)
        if v == 0:
            offs.append(offs[i - 1] + lns[i - 1])
        else:
            offs.append(v - 1)
    return list(zip(tids, offs, lns, rls))


def _gz(data: bytes) -> bytes:
    return gzip.compress(data, mtime=0)


def make_root_leaves(entries):
    """pmtiles.hpp:593-607: root-only if it compresses under
    16384-127, else leaves of 4096 entries (doubling until the root
    fits). Returns (compressed_root, leaves_bytes, num_leaves)."""
    compressed = _gz(serialize_directory(entries))
    if len(compressed) <= 16384 - HEADER_SIZE:
        return compressed, b"", 0
    leaf_size = 4096
    while True:
        root_entries = []
        leaves = bytearray()
        num = 0
        for i in range(0, len(entries), leaf_size):
            sub = entries[i : i + leaf_size]
            comp = _gz(serialize_directory(sub))
            root_entries.append((sub[0][0], len(leaves), len(comp), 0))
            leaves += comp
            num += 1
        root_bytes = _gz(serialize_directory(root_entries))
        if len(root_bytes) < 16384 - HEADER_SIZE:
            return root_bytes, bytes(leaves), num
        leaf_size *= 2


_HEADER_FMT = "<7sB" + "Q" * 11 + "BBBBBB" + "iiii" + "B" + "ii"


def serialize_header(h: dict) -> bytes:
    out = struct.pack(
        _HEADER_FMT,
        b"PMTiles", 3,
        h["root_dir_offset"], h["root_dir_bytes"],
        h["json_metadata_offset"], h["json_metadata_bytes"],
        h["leaf_dirs_offset"], h["leaf_dirs_bytes"],
        h["tile_data_offset"], h["tile_data_bytes"],
        h["addressed_tiles_count"], h["tile_entries_count"],
        h["tile_contents_count"],
        1 if h.get("clustered", True) else 0,
        h.get("internal_compression", COMPRESSION_GZIP),
        h.get("tile_compression", COMPRESSION_GZIP),
        h.get("tile_type", TILETYPE_MVT),
        h["min_zoom"], h["max_zoom"],
        h.get("min_lon_e7", -1800000000), h.get("min_lat_e7", -850511288),
        h.get("max_lon_e7", 1800000000), h.get("max_lat_e7", 850511288),
        h.get("center_zoom", h["min_zoom"]),
        h.get("center_lon_e7", 0), h.get("center_lat_e7", 0),
    )
    assert len(out) == HEADER_SIZE
    return out


def deserialize_header(data: bytes) -> dict:
    if data[:7] != b"PMTiles" or data[7] != 3:
        raise ValueError("pmtiles magic number exception")
    vals = struct.unpack(_HEADER_FMT, data[:HEADER_SIZE])
    keys = [
        "root_dir_offset", "root_dir_bytes", "json_metadata_offset",
        "json_metadata_bytes", "leaf_dirs_offset", "leaf_dirs_bytes",
        "tile_data_offset", "tile_data_bytes", "addressed_tiles_count",
        "tile_entries_count", "tile_contents_count", "clustered",
        "internal_compression", "tile_compression", "tile_type",
        "min_zoom", "max_zoom", "min_lon_e7", "min_lat_e7",
        "max_lon_e7", "max_lat_e7", "center_zoom", "center_lon_e7",
        "center_lat_e7",
    ]
    return dict(zip(keys, vals[2:]))


def write_pmtiles(
    tiles: DataFrame,
    path: str,
    metadata: dict | None = None,
    bounds_e7: tuple[int, int, int, int] | None = None,
    compress_tiles: bool = True,
) -> dict:
    """Write an MVT tile table (columns z int, tx int, ty int,
    payload binary) as a PMTiles v3 archive. Returns the header dict.

    The tile_id assignment and ordering run in Spark (range shuffle on
    the Hilbert tile_id); the driver streams the sorted iterator to
    disk, deduplicating identical payloads (offset reuse) and
    coalescing consecutive-id runs (run_length) exactly as
    ogrpmtilesfromtileset.cpp:271-314."""
    def _tid_fn(z: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            [zxy_to_tileid(int(a), int(b), int(c)) for a, b, c in zip(z, x, y)]
        )

    _tid = F.pandas_udf(_tid_fn, "long")

    ordered = (
        tiles.select(
            _tid(F.col("z"), F.col("tx"), F.col("ty")).alias("tile_id"),
            "z", "payload",
        )
        .sort("tile_id")
    )

    entries = []  # (tile_id, offset, length, run_length)
    seen: dict = {}  # payload sha -> (offset, length)
    addressed = 0
    contents = 0
    minz, maxz = 255, 0
    import hashlib
    import os
    import tempfile

    # tile bytes SPILL to a sidecar file as they stream past — holding
    # the tile-data section in a driver bytearray would break the
    # bounded-memory contract this sink advertises (one partition +
    # directory entries); at archive scale the section is the whole
    # dataset
    spill_fd, spill_path = tempfile.mkstemp(prefix="pmtiles_data_")
    tile_bytes = 0
    try:
        with os.fdopen(spill_fd, "wb") as spill:
            for row in ordered.toLocalIterator():
                tid = int(row["tile_id"])
                minz, maxz = min(minz, int(row["z"])), max(maxz, int(row["z"]))
                data = _gz(bytes(row["payload"])) if compress_tiles else bytes(row["payload"])
                key = hashlib.sha256(data).digest()
                addressed += 1
                if entries and key in seen and entries[-1][0] + entries[-1][3] == tid \
                        and seen[key][0] == entries[-1][1]:
                    # consecutive tile_id with identical content: extend the run
                    t, o, ln, rl = entries[-1]
                    entries[-1] = (t, o, ln, rl + 1)
                    continue
                if key in seen:
                    off, ln = seen[key]
                else:
                    off, ln = tile_bytes, len(data)
                    spill.write(data)
                    tile_bytes += ln
                    seen[key] = (off, ln)
                    contents += 1
                entries.append((tid, off, ln, 1))

        root, leaves, _ = make_root_leaves(entries)
        meta = _gz(json.dumps(metadata or {}, sort_keys=True).encode())
        clustered = all(
            entries[i][1] >= entries[i - 1][1] for i in range(1, len(entries))
        )
        h = {
            "root_dir_offset": HEADER_SIZE,
            "root_dir_bytes": len(root),
            "json_metadata_offset": HEADER_SIZE + len(root),
            "json_metadata_bytes": len(meta),
            "leaf_dirs_offset": HEADER_SIZE + len(root) + len(meta),
            "leaf_dirs_bytes": len(leaves),
            "tile_data_offset": HEADER_SIZE + len(root) + len(meta) + len(leaves),
            "tile_data_bytes": tile_bytes,
            "addressed_tiles_count": addressed,
            "tile_entries_count": len(entries),
            "tile_contents_count": contents,
            "clustered": clustered,
            "internal_compression": COMPRESSION_GZIP,
            "tile_compression": COMPRESSION_GZIP if compress_tiles else COMPRESSION_NONE,
            "tile_type": TILETYPE_MVT,
            "min_zoom": minz if entries else 0,
            "max_zoom": maxz if entries else 0,
        }
        if bounds_e7:
            h["min_lon_e7"], h["min_lat_e7"], h["max_lon_e7"], h["max_lat_e7"] = bounds_e7
        import shutil

        with open(path, "wb") as fh:
            fh.write(serialize_header(h))
            fh.write(root)
            fh.write(meta)
            fh.write(leaves)
            with open(spill_path, "rb") as sf:
                shutil.copyfileobj(sf, fh)
        return h
    finally:
        os.unlink(spill_path)


def read_pmtiles(path: str):
    """Independent reader for round-trip verification: returns
    (header, metadata, {(z, x, y): raw_tile_bytes}) by walking the
    root/leaf directories (pmtiles.hpp:609-630 collect_entries)."""
    with open(path, "rb") as fh:
        blob = fh.read()
    h = deserialize_header(blob[:HEADER_SIZE])
    meta = json.loads(gzip.decompress(
        blob[h["json_metadata_offset"] : h["json_metadata_offset"] + h["json_metadata_bytes"]]
    ))
    tiles = {}

    def walk(off, ln):
        entries = deserialize_directory(gzip.decompress(blob[off : off + ln]))
        for tid, eoff, eln, rl in entries:
            if rl == 0:  # leaf pointer
                walk(h["leaf_dirs_offset"] + eoff, eln)
            else:
                for i in range(rl):
                    z, x, y = tileid_to_zxy(tid + i)
                    start = h["tile_data_offset"] + eoff
                    data = blob[start : start + eln]
                    if h["tile_compression"] == COMPRESSION_GZIP:
                        data = gzip.decompress(data)
                    tiles[(z, x, y)] = data

    walk(h["root_dir_offset"], h["root_dir_bytes"])
    return h, meta, tiles
