"""SOZip (Seek-Optimized ZIP) sink — `gdal vsi sozip` semantics.

Reference: port/cpl_minizip_zip.cpp:2380-2600 (CPLAddFileInZip SOZip
branch: AUTO gate, default 32 KiB chunk, index layout, hidden
`.name.sozip.idx` member excluded from the central directory) and
port/cpl_vsil_gzip.cpp:2240-2300 (per-chunk deflate jobs: each chunk
compressed with a FRESH raw-deflate stream ending in Z_SYNC_FLUSH +
Z_FULL_FLUSH so chunk starts are independent entry points; the final
chunk ends with Z_FINISH), :2390-2440 (index records the compressed
offset where every chunk i>=1 starts).

Index payload layout (cpl_minizip_zip.cpp:2454-2475,1486-1490; reader
checks cpl_vsil_gzip.cpp:4226-4290):
  +0  u32 LE version = 1
  +4  u32 LE reserved = 0
  +8  u32 LE chunk size
  +12 u32 LE offset size (8)
  +16 u64 LE uncompressed size
  +24 u64 LE compressed size (patched at member close)
  +32 ((U-1)//chunk) x u64 LE compressed chunk-start offsets

Spark shape (the same sink pattern as write_cog / write_pmtiles): the
CPU-heavy step — deflating each chunk — is embarrassingly parallel and
runs on executors (one Arrow batch of chunks at a time, fresh
compressobj per chunk exactly like the reference's one-deflate-stream-
per-job thread pool); the driver only streams the (member, chunk_idx)-
sorted iterator into the archive, holding one compressed chunk plus
the current member's index vector. Per-chunk CRC32s combine
order-independently on the driver with the public zlib
crc32_combine() GF(2) algorithm — the uncompressed bytes never travel
to the driver.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

DEFAULT_CHUNK_SIZE = 32 * 1024  # cpl_minizip_zip.cpp:2418 nDefaultSOZipChunkSize

# fixed DOS timestamp (determinism; the reference stamps mtime)
_DOS_TIME = 0
_DOS_DATE = 0x21  # 1980-01-01


# ---------------------------------------------------------------------------
# CRC32 combination (zlib's public crc32_combine, GF(2) matrix trick)

def _gf2_times(mat, vec: int) -> int:
    s = 0
    i = 0
    while vec:
        if vec & 1:
            s ^= mat[i]
        vec >>= 1
        i += 1
    return s


def _gf2_square(mat):
    return [_gf2_times(mat, mat[n]) for n in range(32)]


from functools import lru_cache


@lru_cache(maxsize=64)
def _zeros_operator(len2: int) -> tuple:
    """The GF(2) matrix that advances a CRC past len2 zero-feed bytes,
    cached per length: the driver loop combines one chunk per call and
    every non-tail chunk shares the same len2 (chunk_size), so the
    matrix-squaring chain runs once per distinct length instead of
    once per chunk."""
    odd = [0] * 32
    odd[0] = 0xEDB88320
    row = 1
    for n in range(1, 32):
        odd[n] = row
        row <<= 1
    even = _gf2_square(odd)
    odd = _gf2_square(even)
    op = [1 << n for n in range(32)]  # identity

    def compose(mat, cur):
        return [_gf2_times(mat, c) for c in cur]

    while True:
        even = _gf2_square(odd)
        if len2 & 1:
            op = compose(even, op)
        len2 >>= 1
        if len2 == 0:
            break
        odd = _gf2_square(even)
        if len2 & 1:
            op = compose(odd, op)
        len2 >>= 1
        if len2 == 0:
            break
    return tuple(op)


def crc32_combine(crc1: int, crc2: int, len2: int) -> int:
    """CRC32(A+B) from CRC32(A), CRC32(B), len(B) — zlib crc32_combine."""
    if len2 <= 0:
        return crc1
    return (_gf2_times(_zeros_operator(len2), crc1) ^ crc2) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# chunking (pure Catalyst) + executor-side deflate

def chunk_members(
    df: DataFrame,
    name_col: str = "name",
    data_col: str = "data",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> DataFrame:
    """(name, data) -> (name, chunk_idx, n_chunks, chunk) rows, pure
    Catalyst (substring works on binary). A member's slice array is
    materialized within its row before the explode, so this simple
    path assumes members fit executor memory; at 100 TB feed
    write_sozip() pre-chunked rows instead (any upstream source that
    already yields bounded binary pieces)."""
    cs = int(chunk_size)
    n = F.greatest(
        F.ceil(F.length(F.col(data_col)) / F.lit(cs)).cast("long"), F.lit(1)
    )
    return (
        df.select(
            F.col(name_col).alias("name"),
            F.col(data_col).alias("_data"),
            n.alias("n_chunks"),
        )
        .select(
            "name",
            "n_chunks",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_chunks") - 1),
                    lambda i: F.substring(
                        F.col("_data"), (i * cs + 1).cast("int"), cs
                    ),
                )
            ).alias("chunk_idx", "chunk"),
        )
        .select("name", F.col("chunk_idx").cast("long").alias("chunk_idx"), "n_chunks", "chunk")
    )


def _deflate_chunks(level: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, crcs, ulens = [], [], []
            for r in pdf.itertuples(index=False):
                raw = bytes(r.chunk) if r.chunk is not None else b""
                co = zlib.compressobj(level, zlib.DEFLATED, -15)
                out = co.compress(raw)
                if r.chunk_idx == r.n_chunks - 1:
                    out += co.flush(zlib.Z_FINISH)
                else:
                    # two markers, like the reference (pigz-style
                    # SYNC+FULL flush: 00 00 ff ff 00 00 00 ff ff) —
                    # FULL_FLUSH alone suffices for independence, the
                    # double marker mirrors cpl_vsil_gzip.cpp:2280-2295
                    out += co.flush(zlib.Z_SYNC_FLUSH)
                    out += co.flush(zlib.Z_FULL_FLUSH)
                outs.append(out)
                crcs.append(zlib.crc32(raw) & 0xFFFFFFFF)
                ulens.append(len(raw))
            yield pd.DataFrame(
                {
                    "name": pdf["name"],
                    "chunk_idx": pdf["chunk_idx"],
                    "n_chunks": pdf["n_chunks"],
                    "comp": outs,
                    "crc": pd.array(crcs, dtype="int64"),
                    "ulen": pd.array(ulens, dtype="int64"),
                }
            )

    return fn


# ---------------------------------------------------------------------------
# driver-side archive assembly

def _dos_name(name: str) -> bytes:
    return name.encode("utf-8")


def _local_header(name: bytes, method: int, crc: int, csize: int, usize: int) -> bytes:
    return (
        b"PK\x03\x04"
        + struct.pack(
            "<HHHHHIIIHH",
            20, 0, method, _DOS_TIME, _DOS_DATE, crc, csize, usize, len(name), 0,
        )
        + name
    )


def _central_header(
    name: bytes, method: int, crc: int, csize: int, usize: int, offset: int
) -> bytes:
    return (
        b"PK\x01\x02"
        + struct.pack(
            "<HHHHHHIIIHHHHHII",
            20, 20, 0, method, _DOS_TIME, _DOS_DATE, crc, csize, usize,
            len(name), 0, 0, 0, 0, 0, offset,
        )
        + name
    )


def write_sozip(
    members: DataFrame,
    path: str,
    name_col: str = "name",
    data_col: str = "data",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    level: int = 6,
    min_file_size: int = 0,
    pre_chunked: bool = False,
) -> list[dict]:
    """Write a seek-optimized ZIP at `path` from (name, data) rows (or
    pre-chunked (name, chunk_idx, n_chunks, chunk) rows). Returns a
    manifest list of dicts per member.

    A member gets a SOZip index when uncompressed_size > max(chunk_size,
    min_file_size) (the reference's AUTO gate,
    cpl_minizip_zip.cpp:2420-2425 — SOZIP_MIN_FILE_SIZE defaults to 1M
    there; pass min_file_size=0 to index everything above one chunk).
    Smaller members are written as plain single-stream deflate. The
    hidden index member `[dir/].name.sozip.idx` follows its data member
    immediately, STORED, and is omitted from the central directory
    (INCLUDE_IN_CENTRAL_DIRECTORY=NO, cpl_minizip_zip.cpp:2570-2575),
    so ordinary readers never see it. ZIP64 is not implemented —
    members and archive must stay under 4 GiB (raise otherwise).
    """
    chunks = (
        members
        if pre_chunked
        else chunk_members(members, name_col, data_col, chunk_size)
    )
    comp = chunks.mapInPandas(
        _deflate_chunks(level),
        "name string, chunk_idx long, n_chunks long, comp binary, crc long, ulen long",
    ).orderBy("name", "chunk_idx")

    manifest: list[dict] = []
    with open(path, "wb") as fh:
        cur: dict | None = None

        def close_member() -> None:
            m = cur
            if m is None:
                return
            if max(m["usize"], m["csize"]) >= 0xFFFFFFFF:
                raise NotImplementedError("ZIP64 members not supported")
            # patch the local header's crc/sizes now that they're known
            end = fh.tell()
            fh.seek(m["offset"] + 14)
            fh.write(struct.pack("<III", m["crc"], m["csize"], m["usize"]))
            fh.seek(end)
            sozip = m["usize"] > max(chunk_size, min_file_size) and m["n_chunks"] > 1
            if sozip:
                idx = bytearray(
                    struct.pack(
                        "<IIII", 1, 0, chunk_size, 8
                    )
                    + struct.pack("<QQ", m["usize"], m["csize"])
                )
                for off in m["chunk_offsets"][1:]:
                    idx += struct.pack("<Q", off)
                # hidden member name: dir up to the FIRST slash, then
                # '.' + rest + '.sozip.idx' — strchr, not strrchr,
                # faithfully mirroring cpl_minizip_zip.cpp:2556 (the
                # reader never reconstructs this name: it takes the
                # local header immediately AFTER the member's data and
                # accepts any name containing '.sozip.idx',
                # cpl_vsil_gzip.cpp:4208-4220, so placement is what
                # matters and deep paths read fine)
                nm = m["name"]
                slash = nm.find("/")
                idx_name = (
                    nm[: slash + 1] + "." + nm[slash + 1 :] if slash >= 0 else "." + nm
                ) + ".sozip.idx"
                nb = _dos_name(idx_name)
                fh.write(
                    _local_header(nb, 0, zlib.crc32(bytes(idx)) & 0xFFFFFFFF, len(idx), len(idx))
                )
                fh.write(idx)
            manifest.append(
                {
                    "name": m["name"],
                    "uncompressed": m["usize"],
                    "compressed": m["csize"],
                    "n_chunks": m["n_chunks"],
                    "sozip": bool(sozip),
                    "crc": m["crc"],
                    "offset": m["offset"],
                }
            )

        expected = 0
        for row in comp.toLocalIterator():
            if cur is None or row["name"] != cur["name"]:
                close_member()
                nb = _dos_name(row["name"])
                cur = {
                    "name": row["name"],
                    "offset": fh.tell(),
                    "usize": 0,
                    "csize": 0,
                    "crc": 0,
                    "n_chunks": int(row["n_chunks"]),
                    "chunk_offsets": [],
                }
                fh.write(_local_header(nb, 8, 0, 0, 0))
                expected = 0
            if int(row["chunk_idx"]) != expected:
                raise RuntimeError(
                    f"chunk gap in {row['name']}: got {row['chunk_idx']}, want {expected}"
                )
            expected += 1
            data = bytes(row["comp"])
            cur["chunk_offsets"].append(cur["csize"])
            cur["crc"] = crc32_combine(cur["crc"], int(row["crc"]), int(row["ulen"]))
            cur["usize"] += int(row["ulen"])
            cur["csize"] += len(data)
            fh.write(data)
        close_member()

        # central directory (data members only) + EOCD
        cd_start = fh.tell()
        for m in manifest:
            nb = _dos_name(m["name"])
            fh.write(
                _central_header(
                    nb, 8, m["crc"], m["compressed"], m["uncompressed"], m["offset"]
                )
            )
        cd_size = fh.tell() - cd_start
        if cd_start >= 0xFFFFFFFF:
            raise NotImplementedError("ZIP64 archives not supported")
        fh.write(
            b"PK\x05\x06"
            + struct.pack(
                "<HHHHIIH", 0, 0, len(manifest), len(manifest), cd_size, cd_start, 0
            )
        )
    return manifest


# ---------------------------------------------------------------------------
# independent-side helpers (tests / validation, not the write path)

def read_sozip_index(path: str, member: str) -> dict | None:
    """Parse the hidden .member.sozip.idx entry by scanning local
    headers (it is absent from the central directory by design).
    Returns {chunk_size, uncompressed, compressed, offsets} or None."""
    nm = member
    slash = nm.find("/")
    idx_name = (
        (nm[: slash + 1] + "." + nm[slash + 1 :]) if slash >= 0 else "." + nm
    ) + ".sozip.idx"
    target = idx_name.encode("utf-8")
    with open(path, "rb") as fh:
        data = fh.read()
    pos = 0
    while True:
        pos = data.find(b"PK\x03\x04", pos)
        if pos < 0:
            return None
        (meth, crc, csize, usize, nlen, elen) = struct.unpack(
            "<H4xIIIHH", data[pos + 8 : pos + 30]
        )
        name = data[pos + 30 : pos + 30 + nlen]
        payload_at = pos + 30 + nlen + elen
        if name == target:
            raw = data[payload_at : payload_at + csize]
            version, _res, cs, osz = struct.unpack("<IIII", raw[:16])
            u, c = struct.unpack("<QQ", raw[16:32])
            n_off = (len(raw) - 32) // 8
            offs = list(struct.unpack(f"<{n_off}Q", raw[32 : 32 + 8 * n_off]))
            return {
                "version": version,
                "chunk_size": cs,
                "offset_size": osz,
                "uncompressed": u,
                "compressed": c,
                "offsets": offs,
            }
        pos = payload_at + csize


def decompress_chunk_at(
    path: str, member_offset: int, name_len: int, comp_off: int, chunk_size: int
) -> bytes:
    """Random-access proof: start a FRESH raw inflater at a recorded
    chunk offset and read one chunk — the property the index exists
    for (cpl_vsil_gzip.cpp SOZipIndex reader)."""
    with open(path, "rb") as fh:
        fh.seek(member_offset + 30 + name_len + comp_off)
        blob = fh.read(chunk_size * 2 + 64)
    d = zlib.decompressobj(-15)
    return d.decompress(blob, chunk_size)
