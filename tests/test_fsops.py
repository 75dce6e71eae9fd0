"""gdal vsi list/copy/move/delete/sync + gdal dataset identify/copy/
rename/delete + vector rename-layer + pipeline tee/materialize.

Reference semantics: apps/gdalalg_vsi_*.cpp, port/cpl_vsil.cpp:1084
(VSISync), apps/gdalalg_dataset_*.cpp, apps/gdalalg_tee.h.
"""

import json
import os
import time

import pytest

from gdal_spark.metrics import LINEAGE_FILE
from gdal_spark.operators import fsops


def _mk(tree: dict, base: str) -> None:
    for name, content in tree.items():
        p = os.path.join(base, name)
        if isinstance(content, dict):
            os.makedirs(p, exist_ok=True)
            _mk(content, p)
        else:
            os.makedirs(os.path.dirname(p), exist_ok=True)
            mode = "wb" if isinstance(content, bytes) else "w"
            with open(p, mode) as f:
                f.write(content)


def _read(p: str) -> bytes:
    with open(p, "rb") as f:
        return f.read()


class TestList:
    def test_flat_and_recursive(self, tmp_path):
        _mk({"b.txt": "b", "a.txt": "a", "sub": {"c.txt": "c"}}, str(tmp_path))
        assert fsops.vsi_list(str(tmp_path)) == ["a.txt", "b.txt", "sub"]
        assert fsops.vsi_list(str(tmp_path), recursive=True) == [
            "a.txt",
            "b.txt",
            "sub",
            "sub/c.txt",
        ]

    def test_detailed(self, tmp_path):
        _mk({"a.txt": "hello"}, str(tmp_path))
        rows = fsops.vsi_list(str(tmp_path), detailed=True)
        assert rows[0]["name"] == "a.txt"
        assert rows[0]["size"] == 5
        assert rows[0]["type"] == "file"
        assert rows[0]["mtime_ns"] > 0

    def test_file_target_lists_itself(self, tmp_path):
        _mk({"a.txt": "x"}, str(tmp_path))
        assert fsops.vsi_list(str(tmp_path / "a.txt")) == ["a.txt"]

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            fsops.vsi_list(str(tmp_path / "nope"))


class TestCopyMoveDelete:
    def test_copy_file(self, tmp_path):
        _mk({"a.txt": "abc"}, str(tmp_path))
        n = fsops.vsi_copy(str(tmp_path / "a.txt"), str(tmp_path / "b.txt"))
        assert n == 1 and _read(str(tmp_path / "b.txt")) == b"abc"

    def test_copy_into_existing_dir_keeps_basename(self, tmp_path):
        _mk({"a.txt": "abc", "d": {}}, str(tmp_path))
        fsops.vsi_copy(str(tmp_path / "a.txt"), str(tmp_path / "d"))
        assert _read(str(tmp_path / "d" / "a.txt")) == b"abc"

    def test_copy_dir_requires_recursive(self, tmp_path):
        _mk({"d": {"a.txt": "x"}}, str(tmp_path))
        with pytest.raises(ValueError, match="recursive"):
            fsops.vsi_copy(str(tmp_path / "d"), str(tmp_path / "e"))
        n = fsops.vsi_copy(str(tmp_path / "d"), str(tmp_path / "e"), recursive=True)
        assert n == 1 and _read(str(tmp_path / "e" / "a.txt")) == b"x"

    def test_move(self, tmp_path):
        _mk({"a.txt": "abc"}, str(tmp_path))
        fsops.vsi_move(str(tmp_path / "a.txt"), str(tmp_path / "b.txt"))
        assert not (tmp_path / "a.txt").exists()
        assert _read(str(tmp_path / "b.txt")) == b"abc"

    def test_delete_file_and_dir_guard(self, tmp_path):
        _mk({"a.txt": "x", "d": {"b.txt": "y"}}, str(tmp_path))
        fsops.vsi_delete(str(tmp_path / "a.txt"))
        assert not (tmp_path / "a.txt").exists()
        with pytest.raises(ValueError, match="recursive"):
            fsops.vsi_delete(str(tmp_path / "d"))
        fsops.vsi_delete(str(tmp_path / "d"), recursive=True)
        assert not (tmp_path / "d").exists()


class TestSync:
    def test_initial_sync_copies_all_slash_rule(self, spark, tmp_path):
        src, dst = tmp_path / "src", tmp_path / "dst"
        _mk({"src": {"a.txt": "1", "sub": {"b.txt": "22"}}}, str(tmp_path))

        # trailing slash: contents land directly under dst
        res = fsops.vsi_sync(spark, str(src) + "/", str(dst)).collect()
        assert {(r.relpath, r.action) for r in res} == {
            ("a.txt", "copy"),
            ("sub/b.txt", "copy"),
        }
        assert _read(str(dst / "a.txt")) == b"1"

        # no slash: basename(src) is created under the target
        dst2 = tmp_path / "dst2"
        fsops.vsi_sync(spark, str(src), str(dst2))
        assert _read(str(dst2 / "src" / "sub" / "b.txt")) == b"22"

    def test_timestamp_skips_older_copies_newer(self, spark, tmp_path):
        src, dst = tmp_path / "src", tmp_path / "dst"
        _mk({"src": {"a.txt": "1", "b.txt": "2"}}, str(tmp_path))
        fsops.vsi_sync(spark, str(src) + "/", str(dst))
        # same size, src older than dst -> skip; src newer -> copy
        now = time.time()
        os.utime(src / "a.txt", (now - 100, now - 100))
        os.utime(dst / "a.txt", (now, now))
        os.utime(src / "b.txt", (now + 100, now + 100))
        acts = {
            r.relpath: r.action
            for r in fsops.vsi_sync(spark, str(src) + "/", str(dst)).collect()
        }
        assert acts == {"a.txt": "skip", "b.txt": "copy"}

    def test_size_change_always_copies(self, spark, tmp_path):
        src, dst = tmp_path / "src", tmp_path / "dst"
        _mk({"src": {"a.txt": "1"}}, str(tmp_path))
        fsops.vsi_sync(spark, str(src) + "/", str(dst))
        with open(src / "a.txt", "w") as f:
            f.write("123")
        now = time.time()
        os.utime(src / "a.txt", (now - 100, now - 100))  # even though older
        acts = {
            r.relpath: r.action
            for r in fsops.vsi_sync(spark, str(src) + "/", str(dst)).collect()
        }
        assert acts == {"a.txt": "copy"}
        assert _read(str(dst / "a.txt")) == b"123"

    def test_etag_catches_same_size_same_age_content_change(self, spark, tmp_path):
        src, dst = tmp_path / "src", tmp_path / "dst"
        _mk({"src": {"a.txt": "AAA", "b.txt": "BBB"}}, str(tmp_path))
        fsops.vsi_sync(spark, str(src) + "/", str(dst))
        # rewrite a.txt with same size, then age the source below the dst
        with open(src / "a.txt", "w") as f:
            f.write("AAX")
        now = time.time()
        for p in (src / "a.txt", src / "b.txt"):
            os.utime(p, (now - 100, now - 100))
        # timestamp strategy misses it
        acts = {
            r.relpath: r.action
            for r in fsops.vsi_sync(spark, str(src) + "/", str(dst)).collect()
        }
        assert acts == {"a.txt": "skip", "b.txt": "skip"}
        # etag strategy catches it
        acts = {
            r.relpath: r.action
            for r in fsops.vsi_sync(
                spark, str(src) + "/", str(dst), strategy="ETag"
            ).collect()
        }
        assert acts == {"a.txt": "copy", "b.txt": "skip"}
        assert _read(str(dst / "a.txt")) == b"AAX"

    def test_overwrite_copies_everything(self, spark, tmp_path):
        src, dst = tmp_path / "src", tmp_path / "dst"
        _mk({"src": {"a.txt": "1"}}, str(tmp_path))
        fsops.vsi_sync(spark, str(src) + "/", str(dst))
        acts = {
            r.relpath: r.action
            for r in fsops.vsi_sync(
                spark, str(src) + "/", str(dst), strategy="overwrite"
            ).collect()
        }
        assert acts == {"a.txt": "copy"}

    def test_single_file_to_named_target(self, spark, tmp_path):
        _mk({"a.txt": "abc"}, str(tmp_path))
        res = fsops.vsi_sync(
            spark, str(tmp_path / "a.txt"), str(tmp_path / "out" / "renamed.txt")
        ).collect()
        assert [(r.relpath, r.action) for r in res] == [("renamed.txt", "copy")]
        assert _read(str(tmp_path / "out" / "renamed.txt")) == b"abc"

    def test_bad_strategy(self, spark, tmp_path):
        _mk({"a.txt": "x"}, str(tmp_path))
        with pytest.raises(ValueError, match="strategy"):
            fsops.vsi_sync(spark, str(tmp_path / "a.txt"), str(tmp_path), strategy="md5")


class TestIdentify:
    def test_magic_table(self, spark, tmp_path):
        _mk(
            {
                "t.parquet": b"PAR1" + b"\x00" * 16,
                "t.pmtiles": b"PMTiles\x03" + b"\x00" * 120,
                "plain.zip": b"PK\x03\x04" + b"\x00" * 64,
                "t.geojson": b'{"type": "FeatureCollection", "features": []}',
                "t.geojsonl": b"\x1e" + b'{"type": "Feature"}\n',
                "t.csv": b"a,b\n1,2\n",
                "noise.bin": b"\x00\x01\x02\x03",
            },
            str(tmp_path),
        )
        got = {
            r.relpath: r.driver
            for r in fsops.dataset_identify(spark, str(tmp_path)).collect()
        }
        assert got == {
            "t.parquet": "Parquet",
            "t.pmtiles": "PMTiles",
            "plain.zip": "ZIP",
            "t.geojson": "GeoJSON",
            "t.geojsonl": "GeoJSONSeq",
            "t.csv": "CSV",
        }

    def test_report_failures(self, spark, tmp_path):
        _mk({"noise.bin": b"\x00\x01"}, str(tmp_path))
        got = fsops.dataset_identify(
            spark, str(tmp_path), report_failures=True
        ).collect()
        assert [(r.relpath, r.driver) for r in got] == [("noise.bin", "")]

    def test_sozip_vs_zip_tail_probe(self, spark, tmp_path):
        _mk(
            {
                "a.zip": b"PK\x03\x04" + b"\x00" * 32 + b"PK\x05\x06" + b"\x00" * 18,
                "b.zip": b"PK\x03\x04"
                + b"\x00" * 32
                + b"data.bin.sozip.idx"
                + b"PK\x05\x06"
                + b"\x00" * 18,
            },
            str(tmp_path),
        )
        got = {
            r.relpath: r.driver
            for r in fsops.dataset_identify(spark, str(tmp_path)).collect()
        }
        assert got == {"a.zip": "ZIP", "b.zip": "SOZip"}

    def test_dataset_dir_reports_once_no_descent(self, spark, tmp_path):
        _mk(
            {
                "ds": {
                    LINEAGE_FILE: "{}",
                    "part-00000.parquet": b"PAR1" + b"\x00" * 8,
                },
                "plain": {"x.parquet": b"PAR1" + b"\x00" * 8},
            },
            str(tmp_path),
        )
        got = {
            r.relpath: r.driver
            for r in fsops.dataset_identify(
                spark, str(tmp_path), recursive=True
            ).collect()
        }
        # ds identifies as a dataset, its parts are NOT listed; plain is
        # descended into
        assert got == {"ds": "Parquet", "plain/x.parquet": "Parquet"}
        # force_recursive descends into recognized datasets too
        got = {
            r.relpath: r.driver
            for r in fsops.dataset_identify(
                spark, str(tmp_path), force_recursive=True
            ).collect()
        }
        assert got == {
            "ds": "Parquet",
            "ds/part-00000.parquet": "Parquet",
            "plain/x.parquet": "Parquet",
        }

    def test_single_file_target(self, spark, tmp_path):
        _mk({"t.parquet": b"PAR1\x00"}, str(tmp_path))
        got = fsops.dataset_identify(spark, str(tmp_path / "t.parquet")).collect()
        assert [(r.relpath, r.driver) for r in got] == [(".", "Parquet")]


class TestDatasetOps:
    def test_copy_rename_delete_dir_dataset(self, spark, tmp_path):
        src = str(tmp_path / "ds")
        _mk({"ds": {LINEAGE_FILE: "{}", "p.parquet": b"PAR1x"}}, str(tmp_path))
        dst = str(tmp_path / "ds2")
        fsops.dataset_copy(src, dst)
        assert _read(os.path.join(dst, "p.parquet")) == b"PAR1x"
        assert os.path.exists(os.path.join(dst, LINEAGE_FILE))
        with pytest.raises(FileExistsError):
            fsops.dataset_copy(src, dst)
        fsops.dataset_copy(src, dst, overwrite=True)

        dst3 = str(tmp_path / "ds3")
        fsops.dataset_rename(dst, dst3)
        assert not os.path.exists(dst) and os.path.exists(dst3)

        fsops.dataset_delete(dst3)
        assert not os.path.exists(dst3)

    def test_file_dataset_brings_sidecar(self, tmp_path):
        _mk({"t.pmtiles": b"PMTiles\x03", "t.pmtiles.aux.json": "{}"}, str(tmp_path))
        fsops.dataset_copy(str(tmp_path / "t.pmtiles"), str(tmp_path / "u.pmtiles"))
        assert os.path.exists(tmp_path / "u.pmtiles.aux.json")
        fsops.dataset_delete(str(tmp_path / "u.pmtiles"))
        assert not os.path.exists(tmp_path / "u.pmtiles.aux.json")

    def test_rename_layer(self, tmp_path):
        base = str(tmp_path / "ds")
        _mk(
            {
                "ds": {
                    "roads": {"p.parquet": b"PAR1"},
                    LINEAGE_FILE: json.dumps({"layers": ["roads"]}),
                }
            },
            str(tmp_path),
        )
        fsops.rename_layer(base, "roads", "streets")
        assert os.path.isdir(os.path.join(base, "streets"))
        with open(os.path.join(base, LINEAGE_FILE)) as f:
            assert json.load(f)["layers"] == ["streets"]
        with pytest.raises(FileNotFoundError):
            fsops.rename_layer(base, "roads", "x")
        _mk({"ds": {"other": {}}}, str(tmp_path))
        with pytest.raises(FileExistsError):
            fsops.rename_layer(base, "streets", "other")


class TestTeeMaterialize:
    def test_tee_passthrough_and_sidecar(self, spark, tmp_path):
        df = spark.range(10).toDF("i")
        out = str(tmp_path / "side")
        res = fsops.tee(df, out)
        assert res is df
        back = spark.read.parquet(out)
        assert back.count() == 10
        with open(os.path.join(out, LINEAGE_FILE)) as f:
            assert json.load(f)["row_count"] == 10

    def test_materialize_same_rows(self, spark):
        df = spark.range(100).toDF("i")
        m = fsops.materialize(df)
        assert sorted(r.i for r in m.collect()) == list(range(100))


class TestReviewFixesR4d:
    """Regressions from the round-4 adversarial review of the fsops
    batch (single-file CSV identify, empty-dir copy survival,
    mtime-less filesystems, single-file sync probe, non-recursive
    child-dataset probe)."""

    def test_identify_single_csv_file(self, spark, tmp_path):
        _mk({"t.csv": "a,b\n1,2\n"}, str(tmp_path))
        got = fsops.dataset_identify(spark, str(tmp_path / "t.csv")).collect()
        assert [(r.relpath, r.driver) for r in got] == [(".", "CSV")]

    def test_copy_preserves_empty_subdirs(self, tmp_path):
        _mk({"src": {"a.txt": "a"}}, str(tmp_path))
        os.makedirs(tmp_path / "src" / "emptydir")
        n = fsops.vsi_copy(str(tmp_path / "src"), str(tmp_path / "dst"), recursive=True)
        assert n == 1
        # dst does not pre-exist -> rsync rule: contents land AT dst
        assert (tmp_path / "dst" / "a.txt").read_text() == "a"
        assert (tmp_path / "dst" / "emptydir").is_dir()

    def test_move_preserves_empty_subdirs_cross_fallback(self, tmp_path):
        # same-fs move path keeps the tree; the copy fallback must too
        _mk({"m": {"f.txt": "x"}}, str(tmp_path))
        os.makedirs(tmp_path / "m" / "hollow")
        fsops.vsi_move(str(tmp_path / "m"), str(tmp_path / "out"))
        assert (tmp_path / "out" / "m" / "hollow").is_dir() or (
            tmp_path / "out" / "hollow"
        ).is_dir()
        assert not (tmp_path / "m").exists()

    def test_single_file_sync_does_not_need_dst_listing(self, spark, tmp_path):
        _mk({"a.txt": "data", "dstdir": {}}, str(tmp_path))
        out = fsops.vsi_sync(
            spark, str(tmp_path / "a.txt"), str(tmp_path / "dstdir") + "/"
        ).collect()
        assert [(r.relpath, r.action) for r in out] == [("a.txt", "copy")]
        assert (tmp_path / "dstdir" / "a.txt").read_text() == "data"
        # second run: size-equal + not newer -> skip, decided via the
        # single-target probe
        out = fsops.vsi_sync(
            spark, str(tmp_path / "a.txt"), str(tmp_path / "dstdir") + "/"
        ).collect()
        assert [(r.relpath, r.action) for r in out] == [("a.txt", "skip")]

    def test_identify_nonrecursive_probes_child_datasets(self, spark, tmp_path):
        _mk(
            {
                "ds": {
                    LINEAGE_FILE: "{}",
                    "part-00000.parquet": b"PAR1" + b"\x00" * 8,
                },
                "loose.parquet": b"PAR1" + b"\x00" * 8,
            },
            str(tmp_path),
        )
        got = {
            r.relpath: r.driver
            for r in fsops.dataset_identify(spark, str(tmp_path)).collect()
        }
        # child dataset dir reported once, NOT descended; loose file sniffed
        assert got == {"ds": "Parquet", "loose.parquet": "Parquet"}
