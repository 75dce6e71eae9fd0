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
    iff it holds k candidates with kth_d2 <= (r * cell)^2, because any
    point outside ring r is at least r*cell away.

    Physical plan (round-2 rewrite; round 1 over-fetched (2R+1)^2
    cells per query and silently truncated under-filled queries):
      phase 1  rings 0..1 (9 cells) — finishes almost every query at
               uniform density
      phase 2  rings 0..max_rings, only for queries phase 1 could not
               certify (anti-join routing, fully lazy)
      phase 3  exact knn_broadcast fallback for queries still
               under-filled after max_rings (k-th neighbor beyond the
               covered radius) — collects only those few query points.
    Candidate cells are computed in 2D (cx, cy) with out-of-grid
    offsets DROPPED — the round-1 1D qcell+dx+dy*nx arithmetic wrapped
    across grid edges and produced spurious cross-raster candidates.
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
    )

    def ring_topk(qdf: DataFrame, rings: int) -> DataFrame:
        """Top-k from cells within `rings` of the query cell, keeping
        only distance-certified candidates (d2 <= (rings*cell)^2)."""
        qcx = F.least(
            F.greatest(F.floor((F.col("qx") - grid.minx) / grid.cell_w), F.lit(0)),
            F.lit(grid.nx - 1),
        )
        qcy = F.least(
            F.greatest(F.floor((F.col("qy") - grid.miny) / grid.cell_h), F.lit(0)),
            F.lit(grid.ny - 1),
        )
        offs = [
            (dx, dy)
            for dy in range(-rings, rings + 1)
            for dx in range(-rings, rings + 1)
        ]
        off_arr = F.array(
            *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offs]
        )
        qc = (
            qdf.withColumn("_cx", qcx).withColumn("_cy", qcy)
            .withColumn("_o", F.explode(off_arr))
            .withColumn("cx", F.col("_cx") + F.col("_o.dx"))
            .withColumn("cy", F.col("_cy") + F.col("_o.dy"))
            .filter(
                (F.col("cx") >= 0) & (F.col("cx") < grid.nx)
                & (F.col("cy") >= 0) & (F.col("cy") < grid.ny)
            )
            .select("qid", "qx", "qy", (F.col("cy") * grid.nx + F.col("cx")).cast("long").alias("cell"))
        )
        joined = qc.join(p, "cell").select(
            "qid",
            "nid",
            ((F.col("px") - F.col("qx")) ** 2 + (F.col("py") - F.col("qy")) ** 2).alias("d2"),
        )
        covered = float(rings * cw) ** 2
        joined = joined.filter(F.col("d2") <= F.lit(covered))
        w = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("nid").asc())
        return joined.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")

    t1 = ring_topk(q, 1).persist()
    done1 = t1.groupBy("qid").count().filter(F.col("count") >= k).select("qid")
    pending1 = q.join(done1, "qid", "left_anti")
    out1 = t1.join(done1, "qid", "left_semi")

    t2 = ring_topk(pending1, max_rings).persist()
    done2 = t2.groupBy("qid").count().filter(F.col("count") >= k).select("qid")
    out2 = t2.join(done2, "qid", "left_semi")
    pending2 = pending1.join(done2, "qid", "left_anti")

    # phase 3: exact fallback for the stragglers (tiny by construction)
    rows = pending2.collect()
    result = out1.unionByName(out2)
    if rows:
        fb = knn_broadcast(
            points.select(
                F.col(id_col).alias("id"), F.col(x_col).alias("x"), F.col(y_col).alias("y")
            ),
            [(int(r["qid"]), float(r["qx"]), float(r["qy"])) for r in rows],
            k,
        )
        result = result.unionByName(fb)
    # materialize (results are <= |Q|*k rows) so the phase caches can
    # be released instead of leaking persisted partitions per call
    result = result.localCheckpoint(eager=True)
    t1.unpersist()
    t2.unpersist()
    return result


def _cell_expr(grid: Grid, x_col: str, y_col: str):
    cx = F.floor((F.col(x_col) - F.lit(grid.minx)) / F.lit(grid.cell_w))
    cy = F.floor((F.col(y_col) - F.lit(grid.miny)) / F.lit(grid.cell_h))
    cx = F.least(F.greatest(cx, F.lit(0)), F.lit(grid.nx - 1))
    cy = F.least(F.greatest(cy, F.lit(0)), F.lit(grid.ny - 1))
    return (cy * grid.nx + cx).cast("long")
