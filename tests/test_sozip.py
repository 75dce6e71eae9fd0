"""SOZip sink (cpl_minizip_zip.cpp:2380-2600, cpl_vsil_gzip.cpp
:2240-2300): distributed per-chunk deflate, driver-streamed archive.

Independence proofs use ONLY stdlib readers: zipfile for the archive
round-trip (the hidden index member must be invisible to it), and a
fresh zlib.decompressobj seeded at each recorded index offset for the
random-access property the format exists for."""

from __future__ import annotations

import os
import struct
import zipfile
import zlib

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.sozip import (
    DEFAULT_CHUNK_SIZE,
    chunk_members,
    crc32_combine,
    decompress_chunk_at,
    read_sozip_index,
    write_sozip,
)


def _content(i: int, n: int) -> bytes:
    # deterministic, compressible-but-not-trivial payload
    return b"".join(
        b"%08d:%s\n" % (j, bytes([65 + (i * 7 + j) % 26]) * (j % 40))
        for j in range(n)
    )


@pytest.fixture(scope="module")
def archive(spark, tmp_path_factory):
    td = tmp_path_factory.mktemp("sozip")
    path = str(td / "docs.zip")
    rows = [
        ("big_a.txt", _content(1, 9000)),     # multi-chunk -> indexed
        ("big_b.txt", _content(2, 7000)),     # multi-chunk -> indexed
        ("small.txt", b"tiny member\n"),       # single chunk -> plain
        ("sub/dir_c.txt", _content(3, 6000)),  # path with slashes
        ("empty.txt", b""),
    ]
    df = spark.createDataFrame(rows, "name string, data binary").repartition(4)
    man = write_sozip(df, path, min_file_size=0)
    return path, dict(rows), {m["name"]: m for m in man}


class TestCrcCombine:
    def test_matches_whole_buffer_crc(self):
        a, b = os.urandom(1000), os.urandom(4321)
        assert crc32_combine(zlib.crc32(a), zlib.crc32(b), len(b)) == zlib.crc32(a + b)

    def test_empty_tail(self):
        a = b"abc"
        assert crc32_combine(zlib.crc32(a), 0, 0) == zlib.crc32(a)


class TestChunker:
    def test_chunk_count_and_reassembly(self, spark):
        data = _content(9, 3000)
        df = spark.createDataFrame([("m", data)], "name string, data binary")
        out = chunk_members(df, chunk_size=1024).orderBy("chunk_idx").collect()
        n = (len(data) + 1023) // 1024
        assert [r.chunk_idx for r in out] == list(range(n))
        assert all(r.n_chunks == n for r in out)
        assert b"".join(bytes(r.chunk) for r in out) == data
        assert all(len(bytes(r.chunk)) == 1024 for r in out[:-1])

    def test_empty_member_one_chunk(self, spark):
        df = spark.createDataFrame([("e", b"")], "name string, data binary")
        out = chunk_members(df).collect()
        assert len(out) == 1 and out[0].n_chunks == 1
        assert bytes(out[0].chunk) == b""


class TestZipfileRoundTrip:
    def test_members_and_content(self, archive):
        path, rows, _ = archive
        with zipfile.ZipFile(path) as zf:
            # hidden .sozip.idx members are NOT in the central directory
            assert sorted(zf.namelist()) == sorted(rows)
            for name, data in rows.items():
                assert zf.read(name) == data

    def test_crc_verified_by_zipfile(self, archive):
        path, _, _ = archive
        with zipfile.ZipFile(path) as zf:
            assert zf.testzip() is None  # checks every CRC

    def test_manifest(self, archive):
        path, rows, man = archive
        assert man["big_a.txt"]["sozip"] is True
        assert man["small.txt"]["sozip"] is False
        assert man["empty.txt"]["uncompressed"] == 0
        for name, data in rows.items():
            assert man[name]["uncompressed"] == len(data)


class TestSOZipIndex:
    def test_index_layout(self, archive):
        path, rows, man = archive
        for name in ("big_a.txt", "big_b.txt", "sub/dir_c.txt"):
            idx = read_sozip_index(path, name)
            assert idx is not None, name
            assert idx["version"] == 1
            assert idx["chunk_size"] == DEFAULT_CHUNK_SIZE
            assert idx["offset_size"] == 8
            assert idx["uncompressed"] == len(rows[name])
            assert idx["compressed"] == man[name]["compressed"]
            # (U-1)//chunk offsets (cpl_minizip_zip.cpp:2436)
            assert len(idx["offsets"]) == (len(rows[name]) - 1) // DEFAULT_CHUNK_SIZE
            assert idx["offsets"] == sorted(idx["offsets"])

    def test_no_index_for_small_members(self, archive):
        path, _, _ = archive
        assert read_sozip_index(path, "small.txt") is None
        assert read_sozip_index(path, "empty.txt") is None

    def test_random_access_every_chunk(self, archive):
        """THE seek-optimized property: a fresh raw inflater started at
        any recorded offset yields exactly that chunk's bytes."""
        path, rows, man = archive
        for name in ("big_a.txt", "sub/dir_c.txt"):
            data = rows[name]
            idx = read_sozip_index(path, name)
            offsets = [0] + idx["offsets"]
            for k, off in enumerate(offsets):
                want = data[k * DEFAULT_CHUNK_SIZE : (k + 1) * DEFAULT_CHUNK_SIZE]
                got = decompress_chunk_at(
                    path, man[name]["offset"], len(name.encode()), off,
                    DEFAULT_CHUNK_SIZE,
                )
                assert got == want, (name, k)

    def test_chunk_marker_bytes(self, archive):
        """Non-final chunks end with the reference's 9-byte pigz
        double-marker 00 00 ff ff 00 00 00 ff ff
        (cpl_vsil_gzip.cpp:2280-2295)."""
        path, _, man = archive
        m = man["big_a.txt"]
        idx = read_sozip_index(path, "big_a.txt")
        data_start = m["offset"] + 30 + len(b"big_a.txt")
        with open(path, "rb") as fh:
            fh.seek(data_start)
            blob = fh.read(m["compressed"])
        for off in idx["offsets"]:
            assert blob[off - 9 : off] == b"\x00\x00\xff\xff\x00\x00\x00\xff\xff"


class TestPreChunked:
    def test_pre_chunked_equals_simple(self, spark, tmp_path):
        data = _content(5, 8000)
        df = spark.createDataFrame([("m.bin", data)], "name string, data binary")
        pre = chunk_members(df, chunk_size=4096).repartition(8)
        p = str(tmp_path / "pre.zip")
        write_sozip(pre, p, chunk_size=4096, pre_chunked=True, min_file_size=0)
        with zipfile.ZipFile(p) as zf:
            assert zf.read("m.bin") == data
        idx = read_sozip_index(p, "m.bin")
        assert idx["chunk_size"] == 4096
        assert len(idx["offsets"]) == (len(data) - 1) // 4096


class TestSOZipProperties:
    """Hypothesis sweep over random member contents x chunk sizes:
    archive round-trip + index random access must hold for all."""

    def test_random_members_roundtrip(self, spark, tmp_path):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=8, deadline=None)
        @given(
            st.lists(
                st.binary(min_size=0, max_size=40_000),
                min_size=1, max_size=4, unique=True,
            ),
            st.sampled_from([512, 4096, 32768]),
        )
        def check(bodies, cs):
            import uuid

            rows = [(f"m{i}_{len(b)}.bin", b) for i, b in enumerate(bodies)]
            df = spark.createDataFrame(rows, "name string, data binary")
            p = str(tmp_path / f"prop_{uuid.uuid4().hex}.zip")
            man = {m["name"]: m for m in write_sozip(df, p, chunk_size=cs, min_file_size=0)}
            with zipfile.ZipFile(p) as zf:
                assert zf.testzip() is None
                for name, body in rows:
                    assert zf.read(name) == body
            for name, body in rows:
                idx = read_sozip_index(p, name)
                if len(body) > cs:
                    offsets = [0] + idx["offsets"]
                    assert len(offsets) == (len(body) + cs - 1) // cs
                    for k, off in enumerate(offsets):
                        got = decompress_chunk_at(
                            p, man[name]["offset"], len(name.encode()), off, cs
                        )
                        assert got == body[k * cs : (k + 1) * cs]
                else:
                    assert idx is None
            os.unlink(p)

        check()


class TestDeepPath:
    def test_two_level_member_roundtrip(self, spark, tmp_path):
        """Deep member paths: the hidden index name splits at the FIRST
        slash (reference strchr parity, cpl_minizip_zip.cpp:2556); the
        GDAL reader matches by position + suffix so this reads fine."""
        data = _content(4, 8000)
        df = spark.createDataFrame([("a/b/c.bin", data)], "name string, data binary")
        p = str(tmp_path / "deep.zip")
        man = write_sozip(df, p, min_file_size=0)
        with zipfile.ZipFile(p) as zf:
            assert zf.read("a/b/c.bin") == data
        idx = read_sozip_index(p, "a/b/c.bin")
        assert idx is not None and idx["uncompressed"] == len(data)
        # the index member sits immediately after the data member (the
        # reader's actual lookup rule) and carries the .sozip.idx suffix
        with open(p, "rb") as fh:
            blob = fh.read()
        m = man[0]
        after = m["offset"] + 30 + len(b"a/b/c.bin") + m["compressed"]
        assert blob[after:after + 4] == b"PK\x03\x04"
        nlen = int.from_bytes(blob[after + 26:after + 28], "little")
        assert blob[after + 30:after + 30 + nlen].endswith(b".sozip.idx")
