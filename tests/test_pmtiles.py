"""PMTiles v3 sink (operators/pmtiles.py) vs the reference's vendored
spec implementation (ogr/ogrsf_frmts/pmtiles/pmtiles/pmtiles.hpp) —
tile-id Hilbert mapping, directory varint columns, root/leaf split,
header layout, and an independent-reader round trip of a Spark-written
archive (the test_mvt strategy)."""

from __future__ import annotations

import gzip
import random

import numpy as np
import pytest

from gdal_spark.operators.pmtiles import (
    HEADER_SIZE,
    deserialize_directory,
    deserialize_header,
    make_root_leaves,
    read_pmtiles,
    serialize_directory,
    serialize_header,
    tileid_to_zxy,
    write_pmtiles,
    zxy_to_tileid,
)


class TestTileId:
    def test_spec_vectors(self):
        """The published PMTiles v3 test vectors."""
        assert zxy_to_tileid(0, 0, 0) == 0
        assert zxy_to_tileid(1, 0, 0) == 1
        assert zxy_to_tileid(1, 0, 1) == 2
        assert zxy_to_tileid(1, 1, 1) == 3
        assert zxy_to_tileid(1, 1, 0) == 4
        assert zxy_to_tileid(2, 0, 0) == 5

    def test_bijective_through_z6(self):
        for z in range(7):
            for x in range(1 << z):
                for y in range(1 << z):
                    assert tileid_to_zxy(zxy_to_tileid(z, x, y)) == (z, x, y)

    def test_level_offsets(self):
        """Level z starts at sum(4^t, t<z) (pmtiles.hpp:449)."""
        acc = 0
        for z in range(12):
            assert zxy_to_tileid(z, 0, 0) == acc
            acc += 1 << (2 * z)

    def test_hilbert_locality(self):
        """Consecutive tile ids are grid neighbors (the property that
        makes clustered archives read with short ranges)."""
        ids = {zxy_to_tileid(4, x, y): (x, y) for x in range(16) for y in range(16)}
        ordered = [ids[k] for k in sorted(ids)]
        for (x0, y0), (x1, y1) in zip(ordered, ordered[1:]):
            assert abs(x0 - x1) + abs(y0 - y1) == 1

    def test_bounds_checked(self):
        with pytest.raises(OverflowError):
            zxy_to_tileid(2, 4, 0)
        with pytest.raises(OverflowError):
            zxy_to_tileid(32, 0, 0)


class TestDirectory:
    def test_round_trip(self):
        ents = [(5, 0, 10, 1), (6, 10, 4, 2), (9, 3, 7, 1), (100, 10, 4, 1)]
        assert deserialize_directory(serialize_directory(ents)) == ents

    def test_contiguous_offsets_encode_as_zero(self):
        """pmtiles.hpp:489-494: offset contiguous with previous entry
        encodes as varint 0, else offset+1."""
        ents = [(1, 0, 8, 1), (2, 8, 8, 1)]
        data = serialize_directory(ents)
        # count, deltas (1,1), run_lengths (1,1), lengths (8,8), offsets (1, 0)
        assert list(data) == [2, 1, 1, 1, 1, 8, 8, 1, 0]

    def test_root_only_when_small(self):
        ents = [(i, i * 8, 8, 1) for i in range(10)]
        root, leaves, n = make_root_leaves(ents)
        assert n == 0 and leaves == b""
        assert deserialize_directory(gzip.decompress(root)) == ents

    def test_leaf_split_when_root_too_big(self):
        rnd = random.Random(7)
        ents = []
        off = 0
        for i in range(60000):
            ln = rnd.randrange(1, 1 << 20)
            ents.append((i * rnd.randrange(1, 50) + 60000 * 17, off, ln, 1))
            off += ln
        ents.sort()
        root, leaves, n = make_root_leaves(ents)
        assert n > 0 and len(leaves) > 0
        assert len(root) < 16384 - HEADER_SIZE
        # walking root -> leaves recovers every entry
        got = []
        for tid, loff, lln, rl in deserialize_directory(gzip.decompress(root)):
            assert rl == 0
            got.extend(deserialize_directory(gzip.decompress(leaves[loff : loff + lln])))
        assert got == ents


class TestHeader:
    def test_round_trip(self):
        h = {k: i + 1 for i, k in enumerate(
            ["root_dir_offset", "root_dir_bytes", "json_metadata_offset",
             "json_metadata_bytes", "leaf_dirs_offset", "leaf_dirs_bytes",
             "tile_data_offset", "tile_data_bytes", "addressed_tiles_count",
             "tile_entries_count", "tile_contents_count"])}
        h.update(min_zoom=3, max_zoom=9)
        raw = serialize_header(h)
        assert len(raw) == HEADER_SIZE and raw[:7] == b"PMTiles" and raw[7] == 3
        rt = deserialize_header(raw)
        assert rt["tile_data_offset"] == 7 and rt["max_zoom"] == 9
        assert rt["clustered"] == 1 and rt["tile_type"] == 1

    def test_magic_checked(self):
        with pytest.raises(ValueError):
            deserialize_header(b"NotTiles" + b"\x00" * 120)


class TestArchiveRoundTrip:
    def test_spark_write_independent_read(self, spark, tmp_path):
        """MVT tiles from the real encoder -> PMTiles archive ->
        independent reader recovers every tile byte-exactly, with
        dedup + run-length for identical payloads."""
        from gdal_spark.operators.mvt import mvt_tiles
        from gdal_spark.operators.tiles import WebMercatorQuad

        tms = WebMercatorQuad()
        df = spark.createDataFrame(
            [
                (1, "POINT(100000 4000000)", "a"),
                (2, "POINT(300000 4100000)", "b"),
                (3, "LINESTRING(100000 4000000, 2000000 4500000)", "c"),
            ],
            "_id long, wkt string, name string",
        )
        tiles = mvt_tiles(df, tms, z=2, layer_name="test", attr_cols=["name"])
        for z in (3, 4):
            tiles = tiles.unionByName(
                mvt_tiles(df, tms, z=z, layer_name="test", attr_cols=["name"])
            )
        path = str(tmp_path / "out.pmtiles")
        hdr = write_pmtiles(tiles, path, metadata={"name": "test"})
        assert hdr["min_zoom"] == 2 and hdr["max_zoom"] == 4
        h2, meta, got = read_pmtiles(path)
        assert meta == {"name": "test"}
        want = {(int(r.z), int(r.tx), int(r.ty)): bytes(r.payload) for r in tiles.collect()}
        assert set(got) == set(want)
        for k in want:
            assert got[k] == want[k], k
        assert h2["addressed_tiles_count"] == len(want)
        assert h2["tile_contents_count"] <= h2["tile_entries_count"] <= len(want)

    def test_dedup_and_run_length(self, spark, tmp_path):
        """Identical consecutive-id payloads coalesce into one
        run-length entry; identical non-adjacent payloads share bytes
        (ogrpmtilesfromtileset.cpp:271-314)."""
        same = b"\x1a\x03xyz"
        rows = [(2, x, y, bytearray(same)) for x in range(4) for y in range(4)]
        df = spark.createDataFrame(rows, "z int, tx int, ty int, payload binary")
        path = str(tmp_path / "dedup.pmtiles")
        hdr = write_pmtiles(df, path)
        assert hdr["addressed_tiles_count"] == 16
        assert hdr["tile_contents_count"] == 1
        assert hdr["tile_entries_count"] == 1  # one run of 16 consecutive ids
        assert hdr["clustered"] == 1 or hdr["clustered"] is True
        _, _, got = read_pmtiles(path)
        assert len(got) == 16 and all(v == same for v in got.values())
