"""Linear referencing over Spark — ogrlineref re-expressed.

Reference: /root/reference/apps/ogrlineref.cpp (GetPosition :990 =
project a point onto the path and report the measure; CreateSubline
:261 = extract the part between two measures; -create reference points
at a fixed step along the path) over the OGRSimpleCurve primitives
(ogr/ogrlinestring.cpp Value :2118, Project :2184, getSubLine :2237),
all implemented in geom/ops.py as vectorized numpy.

Scale design: the path is ONE geometry — it rides into every task as a
closure capture (broadcast), and the 10^12-point side never shuffles:
`locate_points` is a single mapInPandas pass appending (measure,
snap_x, snap_y) per row. Inside each Arrow batch the (segments x
points) distance matrix is evaluated in SEGMENT CHUNKS with a running
minimum, so a path with millions of vertices costs
O(chunk x batch) memory, not O(M x N). `reference_points` distributes
measure generation with spark.range — no driver loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from gdal_spark.geom.ops import line_cumlen, line_project, line_value

_SEG_CHUNK = 4096


def _locate_chunked(path: np.ndarray, px: np.ndarray, py: np.ndarray, round_d2: bool) -> np.ndarray:
    """line_project with a running min over segment chunks: identical
    result (first-minimal-segment tie-break preserved by strict `<`
    updates scanning chunks in order), bounded memory."""
    c = np.asarray(path, dtype=np.float64).reshape(-1, 2)
    seg = np.hypot(c[1:, 0] - c[:-1, 0], c[1:, 1] - c[:-1, 1])
    keep = seg > 0
    a, b, sl = c[:-1][keep], c[1:][keep], seg[keep]
    if sl.size == 0:
        return np.zeros(px.shape, dtype=np.float64)
    starts = np.concatenate([[0.0], np.cumsum(sl)])[:-1]
    best_d2 = np.full(px.size, np.inf)
    best_m = np.zeros(px.size)
    for s in range(0, sl.size, _SEG_CHUNK):
        e = min(s + _SEG_CHUNK, sl.size)
        sub = np.concatenate([a[s:e], b[e - 1 : e]])
        m = line_project(sub, px, py, round_d2=round_d2) + starts[s]
        q = line_value(sub, m - starts[s])
        d2 = (px - q[:, 0]) ** 2 + (py - q[:, 1]) ** 2
        if round_d2:
            d2 = np.rint(d2)
        upd = d2 < best_d2
        best_d2[upd] = d2[upd]
        best_m[upd] = m[upd]
    return best_m


def locate_points(
    points: DataFrame,
    path: np.ndarray,
    x_col: str = "x",
    y_col: str = "y",
    round_d2: bool = False,
) -> DataFrame:
    """ogrlineref GetPosition for every row: appends `measure` (the
    distance from the path origin to the row's projection) and the
    snapped point (`snap_x`, `snap_y`) = Value(measure). One Arrow
    pass, zero shuffle; the path is a closure broadcast."""
    path = np.asarray(path, dtype=np.float64).reshape(-1, 2)
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in points.schema.fields)
    out_schema = f"{fields}, measure double, snap_x double, snap_y double"

    def _loc(batches):
        for pdf in batches:
            px = pdf[x_col].to_numpy(dtype=np.float64)
            py = pdf[y_col].to_numpy(dtype=np.float64)
            m = _locate_chunked(path, px, py, round_d2)
            q = line_value(path, m)
            out = pdf.copy()
            out["measure"] = m
            out["snap_x"] = q[:, 0]
            out["snap_y"] = q[:, 1]
            yield out

    return points.mapInPandas(_loc, out_schema)


def reference_points(
    spark: SparkSession, path: np.ndarray, step: float
) -> DataFrame:
    """ogrlineref -create reference points: one row per measure
    0, step, 2*step, ... length (the reference walks dfRoundBeg..end by
    dfStep, ogrlineref.cpp:775). Generation is spark.range-distributed;
    each task interpolates its own measure slice."""
    path = np.asarray(path, dtype=np.float64).reshape(-1, 2)
    total = float(line_cumlen(path)[-1])
    n = int(np.floor(total / step)) + 1

    def _interp(batches):
        for pdf in batches:
            m = pdf["id"].to_numpy(dtype=np.float64) * step
            q = line_value(path, m)
            yield pd.DataFrame({"measure": m, "x": q[:, 0], "y": q[:, 1]})

    return (
        spark.range(n)
        .mapInPandas(_interp, "measure double, x double, y double")
        .withColumn("measure", F.col("measure").cast("double"))
    )
