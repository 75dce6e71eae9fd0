"""Dissolve operators.

`gdal vector dissolve` is PER-FEATURE GEOSLineMerge — 1:1, not a
group union (apps/gdalalg_vector_dissolve.cpp:40-80): each feature's
(multi)linestring has its touching pieces merged through degree-2
nodes. The true group-dissolve (SQLite dialect ST_Union aggregate)
comes in two strengths: dissolve_envelopes (bounding envelopes, a
pure min/max aggregate) and dissolve_union (EXACT polygon union per
key via the snap-rounded overlay kernel, with two-level partial
unions for skewed keys).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from gdal_spark.geom.batch import GeomBatchBuilder, GeomType
from gdal_spark.geom.wkt import parse_wkt, to_wkt


def merge_lines(lines: list[np.ndarray]) -> list[np.ndarray]:
    """GEOSLineMerge: join polylines end-to-end through nodes where
    exactly two line ends meet. Node with degree != 2 (or a merge
    direction conflict) breaks the chain."""
    if not lines:
        return []
    ends: dict[tuple[float, float], list[tuple[int, int]]] = {}
    for i, ln in enumerate(lines):
        for which, pt in ((0, ln[0]), (1, ln[-1])):
            ends.setdefault((float(pt[0]), float(pt[1])), []).append((i, which))

    used = [False] * len(lines)
    out: list[np.ndarray] = []

    def walk(start_i: int, start_which: int) -> np.ndarray:
        """Consume a chain starting with line start_i oriented so that
        it BEGINS at its `start_which` end."""
        used[start_i] = True
        coords = lines[start_i] if start_which == 0 else lines[start_i][::-1]
        coords = [coords]
        cur = tuple(map(float, coords[-1][-1]))
        while True:
            cands = [(j, w) for j, w in ends.get(cur, []) if not used[j]]
            if len(ends.get(cur, [])) != 2 or not cands:
                break
            j, w = cands[0]
            used[j] = True
            nxt = lines[j] if w == 0 else lines[j][::-1]
            coords.append(nxt[1:])
            cur = tuple(map(float, nxt[-1]))
        return np.concatenate(coords, axis=0)

    # chains anchored at non-degree-2 nodes first
    for i, ln in enumerate(lines):
        if used[i]:
            continue
        d0 = len(ends[(float(ln[0][0]), float(ln[0][1]))])
        d1 = len(ends[(float(ln[-1][0]), float(ln[-1][1]))])
        if d0 != 2:
            out.append(walk(i, 0))
        elif d1 != 2:
            out.append(walk(i, 1))
    # remaining pure cycles of degree-2 nodes
    for i in range(len(lines)):
        if not used[i]:
            out.append(walk(i, 0))
    return out


def dissolve(df: DataFrame, wkt_col: str = "wkt", out_col: str = "dissolved_wkt") -> DataFrame:
    """Per-feature line merge (the exact `gdal vector dissolve`
    semantics). Non-line geometries pass through unchanged, matching
    the reference (it only touches (multi)linestrings)."""

    @F.pandas_udf(StringType())
    def _merge(wkt: pd.Series) -> pd.Series:
        batch = parse_wkt(wkt)
        out = []
        for i in range(len(batch)):
            if batch.is_null[i]:
                out.append(None)
                continue
            gtype, parts = batch.geometry(i)
            if gtype not in (GeomType.LINESTRING, GeomType.MULTILINESTRING):
                out.append(wkt.iloc[i])
                continue
            merged = merge_lines([rings[0] for rings in parts])
            b = GeomBatchBuilder()
            if len(merged) == 1:
                b.add(GeomType.LINESTRING, [[merged[0]]])
            else:
                b.add(GeomType.MULTILINESTRING, [[m] for m in merged])
            out.append(to_wkt(b.finish())[0])
        return pd.Series(out, dtype=object)

    return df.withColumn(out_col, _merge(F.col(wkt_col)))


def dissolve_envelopes(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Group dissolve of envelopes: the bounding envelope per key
    (exact ST_Envelope(ST_Union(...)) — a distributive min/max
    aggregate, shuffle only carries 4 doubles per key)."""
    return df.groupBy(*key_cols).agg(
        F.min("env_minx").alias("env_minx"),
        F.min("env_miny").alias("env_miny"),
        F.max("env_maxx").alias("env_maxx"),
        F.max("env_maxy").alias("env_maxy"),
        F.count(F.lit(1)).alias("n_parts"),
    )


def dissolve_union(
    df: DataFrame, key_cols: list[str], wkt_col: str = "wkt", out_col: str = "union_wkt"
) -> DataFrame:
    """TRUE geometric group dissolve: per key, the exact polygon union
    of all member geometries (the SQLite-dialect ST_Union aggregate
    semantics) through the snap-rounded overlay kernel. Map-side
    partial unions keep the shuffle payload to one geometry per
    (key, input-partition) instead of every member row — the
    associative-aggregate shape that survives skewed keys."""
    from gdal_spark.geom.ops import unary_union
    from gdal_spark.geom.wkt import parse_wkt as _parse

    def _union_wkts(wkts: list) -> str | None:
        from gdal_spark.operators.layer_algebra import _polys_to_wkt

        wkts = [w for w in wkts if w]
        if not wkts:
            return None
        b = _parse(wkts)
        regions = [b.polygon_rings(i) for i in range(len(b)) if not b.is_null[i]]
        if not regions:
            return None
        return _polys_to_wkt(unary_union(regions), promote=False)

    from pyspark.sql.types import StringType as _St

    @F.pandas_udf(_St())
    def _partial(wkts: pd.Series) -> str:
        return _union_wkts(wkts.tolist())

    # two-level: partial union per partition (pandas GROUPED_AGG runs
    # map-side partials automatically for associative exprs; here we
    # group twice explicitly: (key, spark_partition) then key)
    staged = (
        df.withColumn("_p", F.spark_partition_id())
        .groupBy(*key_cols, "_p")
        .agg(_partial(F.col(wkt_col)).alias("_u"))
    )
    return staged.groupBy(*key_cols).agg(_partial(F.col("_u")).alias(out_col))
