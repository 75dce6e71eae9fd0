"""Filesystem + dataset-management verbs (`gdal vsi ...`, `gdal dataset ...`).

Reference surface (apps/):
  gdalalg_vsi_list.cpp       gdal vsi list   (--recursive, --long/-l)
  gdalalg_vsi_copy.cpp       gdal vsi copy   (--recursive)
  gdalalg_vsi_move.cpp       gdal vsi move   (VSIMove: rename, cross-FS
                             falls back to copy+delete)
  gdalalg_vsi_delete.cpp     gdal vsi delete (--recursive)
  gdalalg_vsi_sync.cpp +     gdal vsi sync: rsync analog.  Semantics from
  port/cpl_vsil.cpp:1084     VSISync(): trailing-slash source copies the
                             directory CONTENTS, slashless source creates
                             basename(src) under the target; a target file
                             is replaced when the size differs or, under
                             SYNC_STRATEGY=TIMESTAMP, when it is older than
                             the source; ETAG compares content MD5s;
                             OVERWRITE always copies.
  gdalalg_dataset_identify.cpp  gdal dataset identify (GDALIdentifyDriver
                             over header bytes + sibling list; --recursive
                             descends into folders, --force-recursive even
                             into folders already recognized as datasets,
                             --report-failures emits unidentified entries)
  gdalalg_dataset_copy.cpp / _rename.cpp / _delete.cpp
                             GDALCopyDatasetFiles / GDALRenameDataset /
                             GDALDeleteDataset — all files of the dataset
                             move together (sidecars included)
  gdalalg_dataset_check.cpp  gdal dataset check: full-read integrity
                             verification — every pixel window, vector
                             feature and mdim chunk is actually read;
                             any failure => ret code 1
  gdalalg_vector_rename_layer.cpp  layer rename inside a dataset
  gdalalg_tee.h / gdalalg_materialize.cpp  pipeline steps: tee writes the
                             current dataset to side outputs and passes it
                             through; materialize forces it to disk

Design notes (100 TB shape)
---------------------------
The METADATA plane (listings, renames, deletes) is driver-side
``pyarrow.fs`` — one FileSystem abstraction that resolves file://, s3://,
gs://, hdfs:// identically, so the sandbox's local runs and a production
object store run the same code.  The DATA plane is distributed:

* ``vsi_sync`` decides its copy set as a Spark join of the two listings
  (relpath-keyed, map-side prunable) and executes the byte copies on
  EXECUTORS via mapInPandas — each task re-opens the filesystem locally
  and streams 1 MiB chunks, so a million-file sync is embarrassingly
  parallel and no file content ever crosses the driver.  The ETAG
  strategy computes both MD5s inside the same task, and only for
  same-size pairs (different sizes already decide "copy").
* ``dataset_identify`` ships only paths to executors; each task reads
  the FIRST KiB of its files (plus a bounded tail probe for ZIP central
  directories) — identification cost is O(files), not O(bytes).

Local file:// paths on a multi-node cluster are only meaningful on
shared storage; production use is object-store URIs (same code path).
"""

from __future__ import annotations

import hashlib
import json
import os
import posixpath
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..metrics import LINEAGE_FILE, write_snapshot

_CHUNK = 1 << 20
_HEADER_PROBE = 1024
_ZIP_TAIL_PROBE = 66_000  # EOCD + one 64 KiB comment, like zipfile's probe


# ---------------------------------------------------------------------------
# filesystem resolution


def _fs_path(path: str):
    """Resolve path/URI -> (pyarrow FileSystem, normalized path-in-fs)."""
    from pyarrow import fs as pafs

    if "://" in path:
        f, p = pafs.FileSystem.from_uri(path)
        return f, p
    return pafs.LocalFileSystem(), os.path.abspath(path)


def _info(fs, path):
    from pyarrow import fs as pafs

    inf = fs.get_file_info(path)
    if inf.type == pafs.FileType.NotFound:
        return None
    return inf


def _is_dir(fs, path) -> bool:
    from pyarrow import fs as pafs

    inf = _info(fs, path)
    return inf is not None and inf.type == pafs.FileType.Directory


def _walk_files(fs, base: str):
    """Yield FileInfo for every regular file under base (recursive)."""
    from pyarrow import fs as pafs

    sel = pafs.FileSelector(base, recursive=True)
    for inf in fs.get_file_info(sel):
        if inf.type == pafs.FileType.File:
            yield inf


# ---------------------------------------------------------------------------
# gdal vsi list


def vsi_list(path: str, recursive: bool = False, detailed: bool = False):
    """`gdal vsi list`: entries of a directory (or the file itself).

    Returns sorted names relative to `path`; with detailed=True, dicts of
    (name, type, size, mtime_ns) like the reference's --long JSON output.
    """
    from pyarrow import fs as pafs

    fs, p = _fs_path(path)
    inf = _info(fs, p)
    if inf is None:
        raise FileNotFoundError(path)
    if inf.type == pafs.FileType.File:
        infos = [inf]
        base = posixpath.dirname(p)
    else:
        infos = list(fs.get_file_info(pafs.FileSelector(p, recursive=recursive)))
        base = p
    rows = []
    for i in infos:
        rel = posixpath.relpath(i.path, base)
        if detailed:
            rows.append(
                {
                    "name": rel,
                    "type": "directory" if i.type == pafs.FileType.Directory else "file",
                    "size": int(i.size) if i.size is not None else 0,
                    "mtime_ns": int(i.mtime_ns) if i.mtime_ns is not None else 0,
                }
            )
        else:
            rows.append(rel)
    return sorted(rows, key=(lambda r: r["name"]) if detailed else None)


# ---------------------------------------------------------------------------
# gdal vsi copy / move / delete


def _copy_one(src_fs, src_path: str, dst_fs, dst_path: str) -> int:
    parent = posixpath.dirname(dst_path)
    if parent:
        dst_fs.create_dir(parent, recursive=True)
    n = 0
    with src_fs.open_input_stream(src_path) as fin, dst_fs.open_output_stream(
        dst_path
    ) as fout:
        while True:
            buf = fin.read(_CHUNK)
            if not buf:
                break
            fout.write(buf)
            n += len(buf)
    return n


def _resolve_dst(src: str, dst: str, dst_fs, dst_path: str) -> str:
    """cp semantics: copying INTO an existing directory keeps basename."""
    if _is_dir(dst_fs, dst_path):
        return posixpath.join(dst_path, posixpath.basename(src.rstrip("/")))
    return dst_path


def vsi_copy(src: str, dst: str, recursive: bool = False) -> int:
    """`gdal vsi copy`: file copy, or tree copy with recursive=True.

    Returns the number of files copied. Directory sources without
    recursive raise, matching the reference's required -r.
    """
    from pyarrow import fs as pafs

    src_fs, sp = _fs_path(src)
    dst_fs, dp = _fs_path(dst)
    if _is_dir(src_fs, sp):
        if not recursive:
            raise ValueError(f"{src} is a directory (use recursive=True)")
        dst_root = _resolve_dst(src, dst, dst_fs, dp)
        dst_fs.create_dir(dst_root, recursive=True)
        n = 0
        # dirs first so EMPTY subdirectories survive the copy
        for inf in src_fs.get_file_info(pafs.FileSelector(sp, recursive=True)):
            rel = posixpath.relpath(inf.path, sp)
            if inf.type == pafs.FileType.Directory:
                dst_fs.create_dir(posixpath.join(dst_root, rel), recursive=True)
            elif inf.type == pafs.FileType.File:
                _copy_one(src_fs, inf.path, dst_fs, posixpath.join(dst_root, rel))
                n += 1
        return n
    if _info(src_fs, sp) is None:
        raise FileNotFoundError(src)
    _copy_one(src_fs, sp, dst_fs, _resolve_dst(src, dst, dst_fs, dp))
    return 1


def vsi_move(src: str, dst: str) -> None:
    """`gdal vsi move` / VSIMove: rename when the filesystems match
    (fs.equals — same INSTANCE configuration, not merely the same
    class: two S3 stores with different endpoints must not rename
    within one), otherwise — or when the rename itself fails, e.g.
    EXDEV across mount points of one local filesystem — copy
    (recursively) then delete the source."""
    src_fs, sp = _fs_path(src)
    dst_fs, dp = _fs_path(dst)
    target = _resolve_dst(src, dst, dst_fs, dp)
    if src_fs.equals(dst_fs):
        parent = posixpath.dirname(target)
        if parent:
            dst_fs.create_dir(parent, recursive=True)
        try:
            src_fs.move(sp, target)
            return
        except OSError:
            pass  # e.g. EXDEV: fall through to copy+delete
    vsi_copy(src, dst, recursive=True)
    vsi_delete(src, recursive=True)


def vsi_delete(path: str, recursive: bool = False) -> None:
    """`gdal vsi delete`: file delete; directories require recursive=True."""
    fs, p = _fs_path(path)
    inf = _info(fs, p)
    if inf is None:
        raise FileNotFoundError(path)
    if _is_dir(fs, p):
        if not recursive:
            raise ValueError(f"{path} is a directory (use recursive=True)")
        fs.delete_dir(p)
    else:
        fs.delete_file(p)


# ---------------------------------------------------------------------------
# gdal vsi sync — distributed decision plane + executor copy plane


def _md5_of(fs, path: str) -> str:
    h = hashlib.md5()
    with fs.open_input_stream(path) as f:
        while True:
            buf = f.read(_CHUNK)
            if not buf:
                break
            h.update(buf)
    return h.hexdigest()


def vsi_sync(
    spark: SparkSession,
    src: str,
    dst: str,
    strategy: str = "timestamp",
    execute: bool = True,
) -> DataFrame:
    """`gdal vsi sync` (VSISync, cpl_vsil.cpp:1084): one-way rsync.

    Returns a DataFrame (relpath, action, src_size) where action is
    'copy' or 'skip'; with execute=True the 'copy' rows have been
    materialized at dst by executor tasks before this returns.

    Rules replicated from VSISync:
      * src ending in '/' syncs the directory CONTENTS into dst; without
        the slash, basename(src) is created under dst (rsync rule).
      * an existing target file is replaced when its size differs, or
      * strategy='timestamp': when the target is older than the source
        (the reference's upload rule; its download direction flips the
        comparison — we expose one direction, documented),
      * strategy='ETag'/'etag': when the MD5s differ (checked only for
        same-size pairs, executor-side),
      * strategy='overwrite': always.
    """
    strategy = strategy.lower()
    if strategy not in ("timestamp", "etag", "overwrite"):
        raise ValueError(f"unknown strategy {strategy!r}")
    contents_only = src.endswith("/")
    src_fs, sp = _fs_path(src.rstrip("/"))
    dst_fs, dp = _fs_path(dst)

    src_inf = _info(src_fs, sp)
    if src_inf is None:
        raise FileNotFoundError(src)

    def _mt(i) -> int:
        # object stores may omit mtime; 0 = "older than anything", so
        # TIMESTAMP still copies and the other strategies never look
        return 0 if i.mtime_ns is None else int(i.mtime_ns)

    if _is_dir(src_fs, sp):
        dst_root = dp if contents_only else posixpath.join(dp, posixpath.basename(sp))
        src_rows = [
            (r, r, int(i.size), _mt(i))
            for i in _walk_files(src_fs, sp)
            for r in (posixpath.relpath(i.path, sp),)
        ]
        src_root = sp
        dst_rows = []
        if _is_dir(dst_fs, dst_root):
            dst_rows = [
                (posixpath.relpath(i.path, dst_root), int(i.size), _mt(i))
                for i in _walk_files(dst_fs, dst_root)
            ]
    else:
        target = _resolve_dst(src, dst, dst_fs, dp)
        dst_root = posixpath.dirname(target)
        src_rows = [
            (
                posixpath.basename(target),
                posixpath.basename(sp),
                int(src_inf.size),
                _mt(src_inf),
            )
        ]
        src_root = posixpath.dirname(sp)
        # single-file sync: probe the ONE target path instead of
        # recursively listing the whole destination parent (which may
        # hold millions of unrelated objects)
        from pyarrow import fs as pafs

        tinf = _info(dst_fs, target)
        dst_rows = (
            [(posixpath.basename(target), int(tinf.size), _mt(tinf))]
            if tinf is not None and tinf.type == pafs.FileType.File
            else []
        )

    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(
        src_rows, "relpath string, srcrel string, size bigint, mtime_ns bigint"
    )
    ddf = spark.createDataFrame(
        dst_rows, "relpath string, size bigint, mtime_ns bigint"
    ).select(
        "relpath",
        F.col("size").alias("dst_size"),
        F.col("mtime_ns").alias("dst_mtime_ns"),
    )
    j = sdf.join(ddf, "relpath", "left")
    cols = ["relpath", "srcrel", "size"]

    if strategy == "overwrite":
        decided = j.select(*cols, F.lit("copy").alias("action"))
    elif strategy == "timestamp":
        decided = j.select(
            *cols,
            F.when(
                F.col("dst_size").isNull()
                | (F.col("dst_size") != F.col("size"))
                | (F.col("dst_mtime_ns") < F.col("mtime_ns")),
                "copy",
            )
            .otherwise("skip")
            .alias("action"),
        )
    else:  # etag: same-size pairs need an executor-side MD5 compare
        base = j.select(
            *cols,
            F.when(
                F.col("dst_size").isNull() | (F.col("dst_size") != F.col("size")),
                "copy",
            )
            .otherwise("check")
            .alias("action"),
        )
        su, du = src_root, dst_root

        def _check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            sfs, sroot = _fs_path(su)
            dfs, droot = _fs_path(du)
            for pdf in batches:
                acts = []
                for rel, srel, act in zip(
                    pdf["relpath"], pdf["srcrel"], pdf["action"]
                ):
                    if act != "check":
                        acts.append(act)
                    else:
                        same = _md5_of(sfs, posixpath.join(sroot, srel)) == _md5_of(
                            dfs, posixpath.join(droot, rel)
                        )
                        acts.append("skip" if same else "copy")
                out = pdf[["relpath", "srcrel", "size"]].copy()
                out["action"] = acts
                yield out

        decided = base.mapInPandas(
            _check, "relpath string, srcrel string, size bigint, action string"
        )

    out_schema = "relpath string, srcrel string, src_size bigint, action string"
    decided = decided.select(
        "relpath", "srcrel", F.col("size").alias("src_size"), "action"
    )

    if execute:
        su, du = src_root, dst_root

        def _copy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            sfs, sroot = _fs_path(su)
            dfs, droot = _fs_path(du)
            for pdf in batches:
                for rel, srel, act in zip(
                    pdf["relpath"], pdf["srcrel"], pdf["action"]
                ):
                    if act == "copy":
                        _copy_one(
                            sfs,
                            posixpath.join(sroot, srel),
                            dfs,
                            posixpath.join(droot, rel),
                        )
                yield pdf

        # eager localCheckpoint forces the copy side effect exactly once
        # and pins the decisions WITHOUT round-tripping a row per synced
        # file through the driver (a million-file sync stays executor-side)
        decided = decided.mapInPandas(_copy, out_schema).localCheckpoint(eager=True)
    return decided.select("relpath", "src_size", "action")


# ---------------------------------------------------------------------------
# gdal dataset identify


def _sniff(header: bytes, tail: bytes, name: str) -> str:
    """Magic-byte driver identification over the formats this engine
    emits, mirroring GDALIdentifyDriver's header probe."""
    if header[:4] == b"PAR1":
        return "Parquet"
    if header[:7] == b"PMTiles" and len(header) > 7 and header[7] == 3:
        return "PMTiles"
    if header[:4] == b"PK\x03\x04":
        return "SOZip" if b".sozip.idx" in tail else "ZIP"
    if header[:1] == b"\x1e":
        return "GeoJSONSeq"
    stripped = header.lstrip()
    if stripped[:1] == b"{" and b'"type"' in header:
        if b"FeatureCollection" in header or b'"Feature"' in header:
            return "GeoJSON"
    if name.lower().endswith(".csv"):
        return "CSV"
    return ""


def _identify_dir(fs, path: str) -> str:
    """A directory is itself a dataset when it carries the engine's
    lineage sidecar or is a flat parquet dataset (GDALIdentifyDriver's
    sibling-list rule)."""
    from pyarrow import fs as pafs

    names = [
        posixpath.basename(i.path)
        for i in fs.get_file_info(pafs.FileSelector(path, recursive=False))
    ]
    if LINEAGE_FILE in names:
        return "Parquet"
    if any(n.endswith(".parquet") for n in names) and any(
        n == "_SUCCESS" or n.startswith("part-") for n in names
    ):
        return "Parquet"
    return ""


def dataset_identify(
    spark: SparkSession,
    path: str,
    recursive: bool = False,
    force_recursive: bool = False,
    report_failures: bool = False,
) -> DataFrame:
    """`gdal dataset identify`: (path, driver) per target.

    Directory handling follows the reference: a folder recognized as a
    dataset reports once and is not descended into unless
    force_recursive; unrecognized folders are descended with recursive.
    Executors read only the first KiB of each file (plus a bounded ZIP
    tail probe), so cost is O(files) not O(bytes).
    """
    from pyarrow import fs as pafs

    fs, p = _fs_path(path)
    inf = _info(fs, p)
    if inf is None:
        raise FileNotFoundError(path)

    files: list[str] = []
    dirs_as_ds: list[tuple[str, str]] = []

    def visit_dir(d: str) -> None:
        drv = _identify_dir(fs, d)
        if drv:
            dirs_as_ds.append((d, drv))
            if not force_recursive:
                return
        for i in fs.get_file_info(pafs.FileSelector(d, recursive=False)):
            if i.type == pafs.FileType.Directory:
                if recursive or force_recursive:
                    visit_dir(i.path)
                else:
                    # non-recursive: probe the child dir as a dataset
                    # (report, never descend) — deviation from the
                    # reference, which skips entries entirely without
                    # -r; we treat a directory target like a shell
                    # would treat its immediate listing
                    cdrv = _identify_dir(fs, i.path)
                    if cdrv:
                        dirs_as_ds.append((i.path, cdrv))
            else:
                files.append(i.path)

    if inf.type == pafs.FileType.Directory:
        visit_dir(p)
    else:
        files.append(p)

    root_uri = path if "://" in path else p
    base = p

    def _ident(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lfs, lbase = _fs_path(root_uri)
        for pdf in batches:
            drvs = []
            for rel in pdf["relpath"]:
                fp = posixpath.join(lbase, rel) if rel != "." else lbase
                with lfs.open_input_file(fp) as f:
                    header = f.read(_HEADER_PROBE)
                    tail = b""
                    if header[:4] == b"PK\x03\x04":
                        size = f.size()
                        f.seek(max(0, size - _ZIP_TAIL_PROBE))
                        tail = f.read(_ZIP_TAIL_PROBE)
                # a direct single-file target maps to relpath '.' —
                # sniff by the real basename so extension rules (CSV)
                # still apply
                name = rel if rel != "." else posixpath.basename(lbase)
                drvs.append(_sniff(header, tail, name))
            yield pd.DataFrame({"relpath": pdf["relpath"], "driver": drvs})

    rels = [posixpath.relpath(f, base) if f != base else "." for f in files]
    rel_df = spark.createDataFrame([(r,) for r in rels], "relpath string")
    out = rel_df.mapInPandas(_ident, "relpath string, driver string")
    from pyspark.sql import functions as F

    dir_rows = [
        (posixpath.relpath(d, base) if d != base else ".", drv)
        for d, drv in dirs_as_ds
    ]
    if dir_rows:
        out = out.unionByName(
            spark.createDataFrame(dir_rows, "relpath string, driver string")
        )
    if not report_failures:
        out = out.filter(F.col("driver") != "")
    return out


# ---------------------------------------------------------------------------
# gdal dataset copy / rename / delete + vector rename-layer


def _dataset_paths(fs, p: str) -> list[str]:
    """GDALGetFileList analog: the dataset path plus known sidecars."""
    paths = [p]
    for side in (p + ".aux.json",):
        if _info(fs, side) is not None:
            paths.append(side)
    return paths


def dataset_copy(src: str, dst: str, overwrite: bool = False) -> None:
    """`gdal dataset copy` (GDALCopyDatasetFiles): every file of the
    dataset — directory trees move whole (lineage sidecars ride along),
    file datasets bring their external sidecars."""
    src_fs, sp = _fs_path(src)
    dst_fs, dp = _fs_path(dst)
    if _info(dst_fs, dp) is not None:
        if not overwrite:
            raise FileExistsError(dst)
        dataset_delete(dst)
    if _is_dir(src_fs, sp):
        for inf in _walk_files(src_fs, sp):
            rel = posixpath.relpath(inf.path, sp)
            _copy_one(src_fs, inf.path, dst_fs, posixpath.join(dp, rel))
    else:
        for pth in _dataset_paths(src_fs, sp):
            suffix = pth[len(sp):]
            _copy_one(src_fs, pth, dst_fs, dp + suffix)


def dataset_rename(src: str, dst: str, overwrite: bool = False) -> None:
    """`gdal dataset rename` (GDALRenameDataset)."""
    src_fs, sp = _fs_path(src)
    dst_fs, dp = _fs_path(dst)
    if _info(dst_fs, dp) is not None:
        if not overwrite:
            raise FileExistsError(dst)
        dataset_delete(dst)
    if src_fs.equals(dst_fs):
        try:
            if _is_dir(src_fs, sp):
                src_fs.move(sp, dp)
            else:
                for pth in _dataset_paths(src_fs, sp):
                    src_fs.move(pth, dp + pth[len(sp):])
            return
        except OSError:
            pass  # e.g. EXDEV: fall through to copy+delete
    dataset_copy(src, dst)
    dataset_delete(src)


def dataset_delete(path: str) -> None:
    """`gdal dataset delete` (GDALDeleteDataset): all files of the
    dataset go, no recursive flag needed (unlike `vsi delete`)."""
    fs, p = _fs_path(path)
    if _info(fs, p) is None:
        raise FileNotFoundError(path)
    if _is_dir(fs, p):
        fs.delete_dir(p)
    else:
        for pth in _dataset_paths(fs, p):
            fs.delete_file(pth)


def rename_layer(dataset: str, old: str, new: str) -> None:
    """`gdal vector rename-layer`: layers of a multi-layer dataset are
    its immediate subdirectories (the '<dataset>,<layer>' convention the
    vector index sink uses); renames the subdirectory and patches any
    layer name recorded in the dataset-level lineage sidecar."""
    fs, p = _fs_path(dataset)
    src = posixpath.join(p, old)
    dst = posixpath.join(p, new)
    if not _is_dir(fs, src):
        raise FileNotFoundError(f"layer {old!r} not in {dataset}")
    if _info(fs, dst) is not None:
        raise FileExistsError(f"layer {new!r} already in {dataset}")
    fs.move(src, dst)
    lin_path = posixpath.join(p, LINEAGE_FILE)
    if _info(fs, lin_path) is not None:
        with fs.open_input_stream(lin_path) as f:
            rec = json.loads(f.read().decode("utf-8"))
        layers = rec.get("layers")
        if isinstance(layers, list) and old in layers:
            rec["layers"] = [new if x == old else x for x in layers]
            with fs.open_output_stream(lin_path) as f:
                f.write(json.dumps(rec).encode("utf-8"))


# ---------------------------------------------------------------------------
# gdal dataset check

_TILE_COLS = {"band", "ty", "tx", "h", "w", "dtype", "payload"}


def _check_one(fs, base: str, rel: str, expect_rows) -> dict:
    """Fully read one file and report what decoded.  Mirrors the
    reference's per-content loops: every parquet row group of every
    column decompresses and decodes (the band-window / Arrow-stream /
    ProcessPerChunk analogs, gdalalg_dataset_check.cpp:330-530); rows
    count as features unless the part carries the engine's raster
    TILE_SCHEMA, where each payload must be exactly h*w*itemsize bytes
    (the band read's "did the driver hand back the window it promised"
    check) and pixels accumulate.  ZIP members fully decompress (CRC
    verified by the decoder); anything else byte-scans.  n_bytes
    counts bytes DECODED (Arrow table nbytes / decompressed member
    bytes) for structured formats, raw bytes for the byte-scan
    fallback."""
    import numpy as np

    fp = posixpath.join(base, rel) if rel != "." else base
    out = {"relpath": rel, "driver": "", "n_rows": 0, "n_pixels": 0,
           "n_bytes": 0, "ok": True, "error": None}
    try:
        with fs.open_input_file(fp) as f:
            header = f.read(_HEADER_PROBE)
            f.seek(0)
            if header[:4] == b"PAR1":
                import pyarrow.parquet as pq

                out["driver"] = "Parquet"
                pf = pq.ParquetFile(f)
                import pyarrow.compute as pc

                names = set(pf.schema_arrow.names)
                is_tiles = _TILE_COLS <= names
                for rg in range(pf.num_row_groups):
                    t = pf.read_row_group(rg)  # decode EVERY column
                    out["n_rows"] += t.num_rows
                    out["n_bytes"] += t.nbytes
                    if is_tiles:
                        pay = t.column("payload")
                        lens = pc.binary_length(pay).to_numpy(zero_copy_only=False)
                        if pay.null_count:
                            raise ValueError("NULL tile payload")
                        hs = t.column("h").to_numpy(zero_copy_only=False)
                        ws = t.column("w").to_numpy(zero_copy_only=False)
                        sizes = np.array(
                            [np.dtype(dt).itemsize for dt in t.column("dtype").to_pylist()],
                            dtype=np.int64,
                        )
                        want = hs.astype(np.int64) * ws.astype(np.int64) * sizes
                        bad = np.nonzero(lens.astype(np.int64) != want)[0]
                        if bad.size:
                            i = int(bad[0])
                            raise ValueError(
                                f"tile payload {int(lens[i])} bytes, expected "
                                f"{int(want[i])} ({hs[i]}x{ws[i]} "
                                f"{t.column('dtype')[i].as_py()})"
                            )
                        out["n_pixels"] += int(
                            (hs.astype(np.int64) * ws.astype(np.int64)).sum())
            elif header[:4] == b"PK\x03\x04":
                import io
                import zipfile

                out["driver"] = "ZIP"
                data = f.read()
                with zipfile.ZipFile(io.BytesIO(data)) as z:
                    for m in z.infolist():  # full decompress => CRC check
                        out["n_rows"] += 1
                        out["n_bytes"] += len(z.read(m))
            else:
                out["driver"] = _sniff(header, b"", rel)
                while True:
                    chunk = f.read(_CHUNK)
                    if not chunk:
                        break
                    out["n_bytes"] += len(chunk)
            # lineage cross-check applies to EVERY recorded file — a
            # part whose header no longer even reads PAR1 must still
            # flag against its recorded footer row count
            if expect_rows is not None and (
                out["driver"] != "Parquet" or out["n_rows"] != expect_rows
            ):
                raise ValueError(
                    f"lineage records {expect_rows} rows, decoded "
                    f"{out['n_rows'] if out['driver'] == 'Parquet' else 'a non-parquet file'}"
                )
    except Exception as e:  # noqa: BLE001 — the verb's job is to report
        out["ok"] = False
        out["error"] = f"{type(e).__name__}: {e}"
    return out


def dataset_check(spark: SparkSession, path: str) -> DataFrame:
    """`gdal dataset check` (apps/gdalalg_dataset_check.cpp:288-530):
    full-read integrity verification — the reference reads EVERY pixel
    window of every band, every vector feature through the Arrow
    stream, and every mdim chunk, returning ret code 1 on any failure.

    Distributed form: the driver ships ONLY relpaths; each executor
    task re-opens the filesystem and fully decodes its files (see
    _check_one).  Two checks the reference cannot do come free from
    the engine's own sidecars: a part file listed in _lineage.json
    must decode to exactly its recorded footer row count (a torn or
    swapped part flags even when it still parses), and a recorded file
    missing from the listing reports as its own failed row.  Cost is
    O(total bytes) spread across the cluster — the point of the verb.

    Output: one row per file (relpath, driver, n_rows, n_pixels,
    n_bytes, ok, error).  Fold with check_summary() for the
    reference's report shape."""
    from pyarrow import fs as pafs

    fs, p = _fs_path(path)
    inf = _info(fs, p)
    if inf is None:
        raise FileNotFoundError(path)

    expected: dict[str, int] = {}
    if inf.type == pafs.FileType.Directory:
        files = [i.path for i in _walk_files(fs, p)]
        lin_path = posixpath.join(p, LINEAGE_FILE)
        if _info(fs, lin_path) is not None:
            with fs.open_input_stream(lin_path) as f:
                rec = json.loads(f.read().decode("utf-8"))
            for ent in rec.get("files", []):
                expected[ent["file"]] = int(ent["rows"])
    else:
        files = [p]

    root_uri = path if "://" in path else p
    rels = [posixpath.relpath(f, p) if f != p else "." for f in files]
    missing = sorted(set(expected) - set(rels))

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lfs, lbase = _fs_path(root_uri)
        for pdf in batches:
            rows = [
                _check_one(lfs, lbase, rel,
                           int(exp) if exp >= 0 else None)
                for rel, exp in zip(pdf["relpath"], pdf["expect"])
            ]
            yield pd.DataFrame(
                rows,
                columns=["relpath", "driver", "n_rows", "n_pixels",
                         "n_bytes", "ok", "error"],
            )

    rel_df = spark.createDataFrame(
        [(r, expected.get(r, -1)) for r in rels], "relpath string, expect long"
    )
    out = rel_df.mapInPandas(
        _run,
        "relpath string, driver string, n_rows long, n_pixels long, "
        "n_bytes long, ok boolean, error string",
    )
    if missing:
        out = out.unionByName(
            spark.createDataFrame(
                [(m, "", 0, 0, 0, False, "recorded in lineage but absent")
                 for m in missing],
                out.schema,
            )
        )
    return out


def check_summary(report: DataFrame) -> DataFrame:
    """Fold a dataset_check() report to the reference's result shape:
    total content = pixels + 100 * features (the reference's arbitrary
    RATIO_FEATURE_TO_PIXEL equivalence, gdalalg_dataset_check.cpp:317)
    and ret_code 0/1 (:47 return-code output arg).  Failed files
    contribute NOTHING to the content sums — a file that errored
    mid-read carries partial counts that would otherwise make two runs
    failing at different offsets report different totals for the same
    dataset; ret_code already records the failure."""
    from pyspark.sql import functions as F

    ok = F.col("ok")
    feats = F.sum(
        F.when(ok & (F.col("n_pixels") == 0), F.col("n_rows")).otherwise(0))
    px = F.sum(F.when(ok, F.col("n_pixels")).otherwise(0))
    return report.agg(
        F.count(F.lit(1)).alias("n_files"),
        feats.alias("n_features"),
        px.alias("n_pixels"),
        F.sum(F.when(ok, F.col("n_bytes")).otherwise(0)).alias("n_bytes"),
        (px + feats * F.lit(100)).alias("total_content"),
        F.max(F.when(~ok, 1).otherwise(0)).alias("ret_code"),
        F.min(F.when(~ok, F.col("error"))).alias("first_error"),
    )


# ---------------------------------------------------------------------------
# pipeline steps: tee / materialize


def tee(df: DataFrame, paths: list[str] | str, job_id: str = "tee") -> DataFrame:
    """`tee` pipeline step (gdalalg_tee.h): write the current dataset to
    each side output (snapshot + lineage sidecar) and pass it through
    for the next step.  With multiple outputs the dataset is
    materialized ONCE (eager localCheckpoint) so an expensive upstream
    plan does not re-execute per output — the reference likewise
    writes the already-computed dataset to each tee target."""
    if isinstance(paths, str):
        paths = [paths]
    if len(paths) > 1:
        df = df.localCheckpoint(eager=True)
    for p in paths:
        write_snapshot(df, p, job_id=job_id)
    return df


def materialize(df: DataFrame) -> DataFrame:
    """`materialize` pipeline step: force the dataset so downstream steps
    stop recomputing upstream stages (the reference writes a temp GPKG /
    GTiff; Spark's analog is an eager local checkpoint of the plan)."""
    return df.localCheckpoint(eager=True)
