"""`gdal vector sort` — spatial feature ordering.

Reference: apps/gdalalg_vector_sort.cpp (GDALVectorSortAlgorithm).
Two methods:

- ``hilbert`` (gdalalg_vector_sort.cpp:302 GDALVectorHilbertSortLayer):
  per feature, the Hilbert code of its envelope center scaled into the
  LAYER extent via GDALHilbertCode (alg/hilbert.cpp:81-91 —
  round(HILBERT_MAX * (c - min) / extent) per axis, HILBERT_MAX =
  2^16 - 2, alg/hilbert.cpp:17), empty/NULL geometries coded
  UINT32_MAX so they sort last (:366-368); then ascending code order.

- ``strtree`` (gdalalg_vector_sort.cpp:393 GDALVectorSTRTreeSortLayer):
  the leaf-traversal order of a bulk-loaded STR tree with node
  capacity 10 (:425 GEOSSTRtree_create_r(ctx, 10), :519
  GEOSSTRtree_iterate_r), NULL/empty geometries appended in input
  order (:467-470). The packing here is the published STR bulk-load
  (Leutenegger et al., "STR: a simple and efficient algorithm for
  R-tree packing", ICDE 1997 — the algorithm JTS/GEOS STRtree
  implements): at every level sort by envelope-center X, cut into
  sliceCount = ceil(sqrt(ceil(n / capacity))) vertical slices of
  ceil(n / sliceCount) entries, sort each slice by center Y, pack
  consecutive capacity-sized runs into parent nodes (parent envelope =
  union of children), recurse until one root; traversal = depth-first
  child order. DEVIATION: the C++ sorts are std::sort (unstable), so
  GEOS's order on exact center ties is unspecified — here ties break
  by feature id, deterministically.

Spark shape (both methods scale-safe):
- hilbert: layer extent is ONE tiny agg; quantization is Catalyst and
  the code itself ONE Arrow-batched numpy UDF (geom/hilbert.py chain;
  see hilbert_code_cols for why not a Column expression); the global
  sequence comes from dense_seq() below.
- strtree: each level is (global X rank -> slice -> per-slice Y rank
  window -> capacity grouping); slices have ~sqrt(n*capacity) rows so
  the per-slice window partitions stay bounded; levels shrink 10x
  each, and below `driver_guard` nodes the remaining O(log) levels
  finish in numpy on the driver (the graph.py guarded-fast-path
  pattern) — the guard table is <= guard rows by construction.
- dense_seq: exact global 0..n-1 rank WITHOUT a single-partition
  window: arithmetic range buckets -> per-bucket counts (tiny
  driver-side cumsum) -> per-bucket row_number + broadcast offset.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

HILBERT_MAX = (1 << 16) - 2  # alg/hilbert.cpp:17 (max reserved)
EMPTY_CODE = (1 << 32) - 1  # numeric_limits<uint32_t>::max()
_M16 = 0xFFFF


def hilbert_code_cols(x: Column, y: Column) -> Column:
    """GDALHilbertCode(x, y) (alg/hilbert.cpp:19-78) of long Columns in
    [0, 65535], as ONE Arrow-batched UDF over the vectorized numpy
    chain (geom/hilbert.py:25). A pure-Catalyst Column expression of
    the same chain was tried and rejected: each round references
    a/b/c/d several times, so the un-CSE'd expression tree grows
    exponentially (heap-OOM at analysis) — the same negative result
    PLANS.md records for the S2 encode (Arrow UDF 9.5x faster than the
    Catalyst alternative)."""
    from gdal_spark.geom.hilbert import hilbert_code_xy

    @F.pandas_udf("long")
    def _h(xs: pd.Series, ys: pd.Series) -> pd.Series:
        codes = hilbert_code_xy(
            xs.to_numpy(np.uint32), ys.to_numpy(np.uint32)
        )
        return pd.Series(codes.astype(np.int64))

    return _h(x, y)


def dense_seq(
    df: DataFrame,
    key_col: str,
    tie_col: str,
    out_col: str = "seq",
    nbuckets: int = 1024,
) -> DataFrame:
    """Exact dense global rank 0..n-1 of (key, tie) ascending, without
    a global single-partition window: arithmetic value-range buckets
    over [min(key), max(key)], per-bucket counts cumsum'd on the
    driver (<= nbuckets rows), then per-bucket row_number + broadcast
    offset join. Deterministic (no sampling-based range partitioner).
    Raise nbuckets when a single key-range bucket would overflow an
    executor's window partition."""
    from pyspark.sql import Window

    row = df.agg(
        F.min(key_col).alias("mn"), F.max(key_col).alias("mx")
    ).first()
    if row is None or row.mn is None:
        # empty df, or every key NULL: one bucket, tie-ordered
        bucket = F.lit(-1)
    else:
        mn, mx = float(row.mn), float(row.mx)
        span = mx - mn
        if span <= 0:
            bucket = F.lit(0)
        else:
            # divide by the true span (key == mx hits exactly nbuckets and
            # the least() clamps it); dividing by span+1 collapsed every
            # float key with span << 1 into bucket 0 — a single-partition
            # window in disguise
            bucket = F.least(
                F.floor((F.col(key_col) - F.lit(mn)) * nbuckets / F.lit(span)).cast("int"),
                F.lit(nbuckets - 1),
            )
    # NULL keys rank FIRST (the repo-wide OGR NULLS-FIRST order): their
    # own bucket -1 ahead of every value bucket — a NULL bucket would
    # otherwise crash the driver cumsum (None vs int sort) or silently
    # drop the rows through the offset join
    bucket = F.when(F.col(key_col).isNull(), F.lit(-1)).otherwise(bucket).cast("int")
    b = df.withColumn("_bkt", bucket)
    counts = {
        r._bkt: r.n
        for r in b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    off, offs = 0, []
    for k in sorted(counts):
        offs.append((k, off))
        off += counts[k]
    odf = F.broadcast(
        df.sparkSession.createDataFrame(offs, "_bkt int, _off long")
    )
    w = Window.partitionBy("_bkt").orderBy(F.col(key_col).asc(), F.col(tie_col).asc())
    return (
        b.join(odf, "_bkt")
        .withColumn(out_col, F.col("_off") + F.row_number().over(w) - 1)
        .drop("_bkt", "_off")
    )


def hilbert_sort(
    df: DataFrame,
    id_col: str = "fid",
    env_cols: tuple = ("env_minx", "env_miny", "env_maxx", "env_maxy"),
) -> DataFrame:
    """`gdal vector sort --method hilbert`: input rows + `hcode` (the
    GDALHilbertCode of the envelope center over the layer extent;
    EMPTY_CODE for rows with NULL envelope) + `seq` (0..n-1 traversal
    position; empties last, ties by id)."""
    mnx, mny, mxx, mxy = env_cols
    ext = df.agg(
        F.min(mnx).alias("x0"), F.min(mny).alias("y0"),
        F.max(mxx).alias("x1"), F.max(mxy).alias("y1"),
    ).first()
    if ext.x0 is None:  # no non-empty geometry at all
        return dense_seq(
            df.withColumn("hcode", F.lit(EMPTY_CODE)), "hcode", id_col
        )
    w_ = float(ext.x1) - float(ext.x0)
    h_ = float(ext.y1) - float(ext.y0)
    cx = (F.col(mnx) + F.col(mxx)) / 2
    cy = (F.col(mny) + F.col(mxy)) / 2
    # x = round(HILBERT_MAX * (c - min) / extent); 0 when extent is
    # degenerate (hilbert.cpp:83-90). round = half away from zero on
    # nonnegative values -> F.round matches std::round here.
    xq = (
        F.round(F.lit(float(HILBERT_MAX)) * (cx - F.lit(float(ext.x0))) / F.lit(w_)).cast("long")
        if w_ != 0.0 else F.lit(0)
    )
    yq = (
        F.round(F.lit(float(HILBERT_MAX)) * (cy - F.lit(float(ext.y0))) / F.lit(h_)).cast("long")
        if h_ != 0.0 else F.lit(0)
    )
    # NULL envelopes feed 0 into the UDF (Arrow batches reject NaN->
    # uint32) and the when() overrides the result with EMPTY_CODE
    coded = df.withColumn(
        "hcode",
        F.when(F.col(mnx).isNull(), F.lit(EMPTY_CODE)).otherwise(
            hilbert_code_cols(F.coalesce(xq, F.lit(0)), F.coalesce(yq, F.lit(0)))
        ),
    )
    return dense_seq(coded, "hcode", id_col)


# ---------------------------------------------------------------------------
# STR bulk-load ordering


def _str_level_local(minx, miny, maxx, maxy, ids, cap):
    """One STR packing level in numpy: returns (parent envelopes,
    ordered member-lists) where members concatenate in traversal
    order. ids supplies the deterministic tiebreak."""
    n = len(minx)
    cx = (minx + maxx) / 2.0
    cy = (miny + maxy) / 2.0
    slice_cnt = int(math.ceil(math.sqrt(math.ceil(n / cap))))
    slice_capacity = int(math.ceil(n / slice_cnt))
    xorder = np.lexsort((ids, cx))
    parents = []
    for s0 in range(0, n, slice_capacity):
        sl = xorder[s0 : s0 + slice_capacity]
        yorder = sl[np.lexsort((ids[sl], cy[sl]))]
        for g0 in range(0, len(yorder), cap):
            grp = yorder[g0 : g0 + cap]
            parents.append(grp)
    penv = np.array(
        [
            (minx[g].min(), miny[g].min(), maxx[g].max(), maxy[g].max())
            for g in parents
        ]
    )
    return penv, parents


def strtree_order_local(minx, miny, maxx, maxy, cap: int = 10) -> np.ndarray:
    """Traversal order (positions 0..n-1 per input index) of the STR
    bulk-loaded tree over the given envelopes — the scalar replica of
    the distributed strtree_sort, also the driver-guard finisher."""
    n = len(minx)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    members = [np.array([i]) for i in range(n)]
    env = (minx.copy(), miny.copy(), maxx.copy(), maxy.copy())
    ids = np.arange(n, dtype=np.int64)
    while len(members) > 1:
        penv, groups = _str_level_local(*env, ids, cap)
        members = [np.concatenate([members[c] for c in g]) for g in groups]
        env = (penv[:, 0], penv[:, 1], penv[:, 2], penv[:, 3])
        ids = np.arange(len(members), dtype=np.int64)
    order = members[0]
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    return rank


def strtree_sort(
    df: DataFrame,
    id_col: str = "fid",
    env_cols: tuple = ("env_minx", "env_miny", "env_maxx", "env_maxy"),
    capacity: int = 10,
    driver_guard: int = 200_000,
) -> DataFrame:
    """`gdal vector sort --method strtree`: input rows + `seq` = the
    STR leaf-traversal position (NULL-envelope rows appended in id
    order). Distributed per level until the node table fits under
    driver_guard, then the numpy finisher ranks the remaining levels
    (<= guard rows collected, the graph.py:162 guard pattern)."""
    from pyspark.sql import Window

    mnx, mny, mxx, mxy = env_cols
    items = df.filter(F.col(mnx).isNotNull())
    empties = df.filter(F.col(mnx).isNull())
    n = items.count()
    if n == 0:
        return dense_seq(df, id_col, id_col)

    cx = ((F.col(mnx) + F.col(mxx)) / 2).alias("_cx")
    cy = ((F.col(mny) + F.col(mxy)) / 2).alias("_cy")
    cur = items.select(
        F.col(id_col).alias("_nid"), cx, cy,
        F.col(mnx).alias("_x0"), F.col(mny).alias("_y0"),
        F.col(mxx).alias("_x1"), F.col(mxy).alias("_y1"),
    )
    cur_n = n
    # per level: (child table with parent uid + pos) — kept as DFs and
    # composed top-down at the end
    assignments = []  # list of DF(_nid, _parent, _pos) high levels LAST

    while cur_n > max(driver_guard, capacity):
        slice_cnt = int(math.ceil(math.sqrt(math.ceil(cur_n / capacity))))
        slice_capacity = int(math.ceil(cur_n / slice_cnt))
        leaves_per_slice = int(math.ceil(slice_capacity / capacity))
        xr = dense_seq(cur, "_cx", "_nid", out_col="_xr")
        xr = xr.withColumn("_slice", F.floor(F.col("_xr") / slice_capacity).cast("long"))
        wy = Window.partitionBy("_slice").orderBy(F.col("_cy").asc(), F.col("_nid").asc())
        yr = xr.withColumn("_yr", F.row_number().over(wy) - 1)
        lv = yr.select(
            "_nid", "_x0", "_y0", "_x1", "_y1",
            (F.col("_slice") * leaves_per_slice + F.floor(F.col("_yr") / capacity)).alias("_parent"),
            (F.col("_yr") % capacity).alias("_pos"),
        ).localCheckpoint()
        # checkpoint per level: dense_seq/count fire several actions per
        # iteration and the compose-down loop re-joins every lv — without
        # truncating lineage each one re-executes all prior levels'
        # windows from the source
        assignments.append(lv.select("_nid", "_parent", "_pos"))
        cur = lv.groupBy("_parent").agg(
            F.min("_x0").alias("_x0"), F.min("_y0").alias("_y0"),
            F.max("_x1").alias("_x1"), F.max("_y1").alias("_y1"),
        ).select(
            F.col("_parent").alias("_nid"),
            ((F.col("_x0") + F.col("_x1")) / 2).alias("_cx"),
            ((F.col("_y0") + F.col("_y1")) / 2).alias("_cy"),
            "_x0", "_y0", "_x1", "_y1",
        )
        cur_n = cur.count()

    # driver finisher: rank the remaining node levels exactly. Sorted
    # by _nid: collect order is arbitrary, and _nid order IS the
    # pack order of the level below (uid = slice*lps + leaf_local is
    # lexicographic in (slice, leaf_local)) / the id order for items —
    # the deterministic tiebreak the distributed levels use.
    pnodes = (
        cur.select("_nid", "_x0", "_y0", "_x1", "_y1")
        .toPandas()
        .sort_values("_nid", ignore_index=True)
    )
    ranks = strtree_order_local(
        pnodes["_x0"].to_numpy(), pnodes["_y0"].to_numpy(),
        pnodes["_x1"].to_numpy(), pnodes["_y1"].to_numpy(), cap=capacity,
    )
    spark = df.sparkSession
    rank_df = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame({"_nid": pnodes["_nid"], "_rank": ranks})
        )
    )

    # compose down: rank_child = rank_parent * capacity + pos
    for lv in reversed(assignments):
        rank_df = lv.join(
            rank_df.withColumnRenamed("_nid", "_parent"), "_parent"
        ).select(
            "_nid", (F.col("_rank") * capacity + F.col("_pos")).alias("_rank")
        )
        # levels shrink 10x upward, so every joined table here is the
        # next level down; only the top (guard-sized) one broadcasts
    ranked = items.join(
        rank_df.withColumnRenamed("_nid", id_col), id_col
    )
    seqd = dense_seq(ranked, "_rank", id_col).drop("_rank")
    if empties.isEmpty():
        return seqd
    etail = dense_seq(empties, id_col, id_col, out_col="_eseq")
    etail = etail.withColumn("seq", F.lit(n) + F.col("_eseq")).drop("_eseq")
    return seqd.unionByName(etail)
