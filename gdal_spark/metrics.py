"""Lineage + per-partition metrics + checkpoint/resume (north rule:
"resumable from per-partition checkpoints with lineage + row-count
metrics written alongside each snapshot").

Reference analog: `gdal raster tile --resume` skips already-produced
tiles (apps/gdalalg_raster_tile.cpp:289,675,1506) and reports progress
via GDALProgressFunc (port/cpl_progress.cpp). Distributed design:

* the SNAPSHOT is the committed output directory (Parquet/Iceberg
  semantics: only files of successful task commits are visible — task
  retries can never double-count because metrics are derived from the
  committed files, not from task-side counters);
* `write_snapshot` writes the data then a `_lineage.json` sidecar
  with per-file row counts (read from parquet footers — metadata
  only, no data scan), totals, input paths, and job params;
* `resume_done_keys` + `anti_join_done` implement restart: load the
  done key set from the last snapshot and anti-join it against the
  work list (the exact --resume semantics, but as a distributed
  anti-join instead of a filesystem stat per tile).
"""

from __future__ import annotations

import json
import os
import time
from typing import Sequence

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, functions as F

LINEAGE_FILE = "_lineage.json"


def _data_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def write_snapshot(
    df: DataFrame,
    path: str,
    job_id: str,
    inputs: Sequence[str] = (),
    params: dict | None = None,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> dict:
    """Write df as a parquet snapshot + _lineage.json sidecar.

    Returns the lineage record. Per-partition row counts come from the
    committed parquet footers (cheap, metadata-only), so a retried or
    speculative task attempt that did not commit contributes nothing —
    the (partition, attempt) dedup the SURVEY watchlist calls for is
    inherited from the commit protocol instead of re-implemented.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)

    files = []
    total = 0
    for f in _data_files(path):
        n = pq.ParquetFile(f).metadata.num_rows
        total += n
        files.append({"file": os.path.relpath(f, path), "rows": n})
    rec = {
        "job_id": job_id,
        "ts": time.time(),
        "inputs": list(inputs),
        "params": params or {},
        "row_count": total,
        "n_files": len(files),
        "files": files,
    }
    with open(os.path.join(path, LINEAGE_FILE), "w") as fh:
        json.dump(rec, fh, indent=1)
    return rec


def read_lineage(path: str) -> dict | None:
    p = os.path.join(path, LINEAGE_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def resume_done_keys(spark: SparkSession, path: str, key_cols: Sequence[str]) -> DataFrame | None:
    """Distinct already-produced keys from the previous snapshot, or
    None when no (complete) snapshot exists. A snapshot without its
    lineage sidecar is treated as absent (half-written run)."""
    if read_lineage(path) is None:
        return None
    return spark.read.parquet(path).select(*key_cols).distinct()


def anti_join_done(work: DataFrame, done: DataFrame | None, key_cols: Sequence[str]) -> DataFrame:
    """--resume: drop work items whose keys already exist. Done-key
    sets are tiny relative to work (keys only) — broadcast them so the
    big side never shuffles."""
    if done is None:
        return work
    return work.join(F.broadcast(done), on=list(key_cols), how="left_anti")


def append_snapshot(
    df: DataFrame,
    path: str,
    job_id: str,
    inputs: Sequence[str] = (),
    params: dict | None = None,
) -> dict:
    """Append a delta (e.g. the resumed remainder of a tile job) and
    refresh the lineage sidecar over the union of committed files."""
    return write_snapshot(df, path, job_id, inputs=inputs, params=params, mode="append")
