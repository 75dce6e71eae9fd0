"""Spatial extraction, filter, and broadcast R-tree join operators.

The engine's minimum end-to-end slice (SURVEY.md §7 phase 2):

  docs (doc_id, spans)                        [Iceberg/Parquet scan]
    -> extract_geom       : first kind='geom' span -> wkt + envelope
                            columns + parse-error column (JVM-side
                            span filtering; Arrow UDF only for parse)
    -> cell keys          : Grid.cell_col_sql / hilbert_cell_udf
    -> spatial_filter_*   : OGR FilterGeometry cascade
                            (ogrlayer.cpp:4004) — envelope stages as
                            Catalyst column predicates (pushed to the
                            parquet scan when envelopes are
                            materialized), exact stage in an Arrow UDF
    -> spatial_join       : docs x broadcast(zones) intersects join
                            via packed Hilbert R-tree probe + exact
                            ray-cast verify; optional OGR first-match
                            (ogr_gensql.cpp:1515-1546: lowest
                            secondary FID wins, 1:1 never 1:N)

Span-sequence invariant: none of these operators touch the spans
column — it rides through shuffles as an opaque array<struct>, whose
element order Spark preserves natively (SURVEY.md §1.3).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gdal_spark.geom.batch import GeomBatch, GeomType
from gdal_spark.geom.predicates import (
    batch_intersects_rings,
    filter_geometry_batch,
    geometry_intersects_rings,
    points_in_edges,
    rings_to_edges,
)
from gdal_spark.geom.rtree import PackedRTree
from gdal_spark.geom.wkt import parse_wkt

ENVELOPE_SCHEMA = StructType(
    [
        StructField("minx", DoubleType()),
        StructField("miny", DoubleType()),
        StructField("maxx", DoubleType()),
        StructField("maxy", DoubleType()),
        StructField("geom_type", LongType()),
        StructField("error", StringType()),
    ]
)


@F.pandas_udf(ENVELOPE_SCHEMA)
def envelope_udf(wkt: pd.Series) -> pd.DataFrame:
    """WKT -> envelope struct; invalid WKT lands in .error (F1 rule)."""
    batch, errors = parse_wkt(wkt, return_errors=True)
    env = batch.envelopes()
    return pd.DataFrame(
        {
            "minx": env[:, 0],
            "miny": env[:, 1],
            "maxx": env[:, 2],
            "maxy": env[:, 3],
            "geom_type": batch.types.astype(np.int64),
            "error": pd.array(errors, dtype=object),
        }
    )


@F.pandas_udf(DoubleType())
def area_udf(wkt: pd.Series) -> pd.Series:
    """Exact planar geometry area (OGRGeometry::get_Area semantics:
    shoelace exterior minus holes, summed over parts —
    ogrsqlitesqlfunctions.cpp:636 ST_Area). 0 for points/lines."""
    return pd.Series(parse_wkt(wkt).areas())


def extract_geom(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Pull the first kind='geom' span's WKT + envelope columns.

    Span filtering stays JVM-side (Catalyst higher-order functions);
    only WKT parsing crosses into Arrow. Matches the reference's
    geometry-column access pattern: geometry is one column of the
    feature, never a row explosion (ogr/ogrfeature.cpp).

    Measured and rejected (round 3): a Catalyst regexp/split+try_cast
    fast path for simple POINT rows that masks the UDF input to NULL.
    Interleaved A/B at 2M docs: plain UDF 3.96 s vs regexp 4.26 s vs
    split+cast 4.13 s — per-row JVM string work costs as much as the
    Arrow crossing it saves, on top of real semantic risk (cast vs
    parser literal grammar). The vectorized-numpy parser is the fast
    path."""
    geom_span = F.filter(F.col(spans_col), lambda s: s["kind"] == F.lit("geom"))
    # try_element_at: docs with NO geom span get wkt=NULL (not an error)
    df = df.withColumn("wkt", F.try_element_at(geom_span, F.lit(1))["text"])
    df = df.withColumn("_env", envelope_udf(F.col("wkt")))
    return df.select(
        "*",
        F.col("_env.minx").alias("env_minx"),
        F.col("_env.miny").alias("env_miny"),
        F.col("_env.maxx").alias("env_maxx"),
        F.col("_env.maxy").alias("env_maxy"),
        F.col("_env.error").alias("geom_error"),
    ).drop("_env")


def _filter_rings_from_wkt(filter_wkt: str) -> list[np.ndarray]:
    batch = parse_wkt([filter_wkt])
    return batch.polygon_rings(0)


def spatial_filter(
    df: DataFrame,
    filter_wkt: str,
    exact: bool = True,
    wkt_col: str = "wkt",
    use_envelope_cols: bool = True,
) -> DataFrame:
    """ogr2ogr -spat semantics (OGRLayer::FilterGeometry cascade).

    Stage 1 (envelope reject) runs as plain column predicates when
    extract_geom's envelope columns are present — Catalyst pushes them
    into the parquet scan (PushedFilters), the distributed analog of
    GeoParquet bbox row-group skipping (ogrparquetlayer.cpp:333-471).
    The exact stage evaluates the full cascade in an Arrow UDF on the
    survivors only. exact=False reproduces the reference's no-GEOS
    envelope-only behavior (test_ogr2ogr.py:77-94, 4-vs-5 split)."""
    rings = _filter_rings_from_wkt(filter_wkt)
    fminx = min(float(r[:, 0].min()) for r in rings)
    fminy = min(float(r[:, 1].min()) for r in rings)
    fmaxx = max(float(r[:, 0].max()) for r in rings)
    fmaxy = max(float(r[:, 1].max()) for r in rings)

    if use_envelope_cols and "env_minx" in df.columns:
        df = df.filter(
            (F.col("env_maxx") >= fminx)
            & (F.col("env_maxy") >= fminy)
            & (F.col("env_minx") <= fmaxx)
            & (F.col("env_miny") <= fmaxy)
        )

    @F.pandas_udf(BooleanType())
    def _cascade(wkt: pd.Series) -> pd.Series:
        batch = parse_wkt(wkt)
        return pd.Series(filter_geometry_batch(batch, rings, exact=exact))

    return df.filter(_cascade(F.col(wkt_col)))


class ZoneIndex:
    """Driver-built broadcastable polygon set: envelopes + rings +
    packed Hilbert R-tree (the FlatGeobuf-style static index,
    packedrtree.h:78). Pickles cleanly into a Spark broadcast."""

    def __init__(self, fids: np.ndarray, wkts: list[str]) -> None:
        self.fids = np.asarray(fids, dtype=np.int64)
        batch = parse_wkt(wkts)
        self.rings: list[list[np.ndarray]] = [batch.polygon_rings(i) for i in range(len(batch))]
        self.edges = [rings_to_edges(r) for r in self.rings]
        self.envs = batch.envelopes()
        self.tree = PackedRTree(np.nan_to_num(self.envs, nan=0.0))
        self.types = batch.types

    @classmethod
    def from_df(cls, zones: DataFrame, fid_col: str = "fid", wkt_col: str = "wkt") -> "ZoneIndex":
        pdf = zones.select(fid_col, wkt_col).toPandas()
        return cls(pdf[fid_col].to_numpy(), pdf[wkt_col].tolist())

    def probe_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Exact intersects of N points vs the zone set.
        Returns (point_idx, zone_pos) pairs after ray-cast verify."""
        pi, zi = self.tree.query_points(px, py)
        if pi.size == 0:
            return pi, zi
        keep = np.zeros(pi.size, dtype=bool)
        # group candidate pairs by zone -> one vectorized ray cast per zone
        order = np.argsort(zi, kind="stable")
        pi, zi = pi[order], zi[order]
        bounds = np.flatnonzero(np.diff(zi)) + 1
        for s, e in zip(np.concatenate([[0], bounds]), np.concatenate([bounds, [zi.size]])):
            z = zi[s]
            keep[s:e] = points_in_edges(px[pi[s:e]], py[pi[s:e]], self.edges[z])
        return pi[keep], zi[keep]

    def probe_batch(self, batch: GeomBatch) -> tuple[np.ndarray, np.ndarray]:
        """Exact intersects of a mixed geometry batch vs the zone set.
        Point rows go through the vectorized path; other rows probe the
        R-tree by envelope then verify pairwise."""
        n = len(batch)
        envs = batch.envelopes()
        is_pt = (batch.types == GeomType.POINT) & ~batch.is_empty
        out_d: list[np.ndarray] = []
        out_z: list[np.ndarray] = []
        pt_idx = np.flatnonzero(is_pt)
        if pt_idx.size:
            first_ring = batch.part_ring_off[batch.geom_part_off[pt_idx]]
            cidx = batch.ring_coord_off[first_ring]
            pi, zi = self.probe_points(batch.coords[cidx, 0], batch.coords[cidx, 1])
            out_d.append(pt_idx[pi])
            out_z.append(zi)
        for i in np.flatnonzero(~is_pt & ~batch.is_empty):
            if np.isnan(envs[i, 0]):
                continue
            cand = self.tree.query_rect(*envs[i])
            if cand.size == 0:
                continue
            hits = [z for z in cand if batch_intersects_rings(batch, i, self.rings[z], self.edges[z])]
            if hits:
                out_d.append(np.full(len(hits), i, dtype=np.int64))
                out_z.append(np.asarray(hits, dtype=np.int64))
        if not out_d:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_d), np.concatenate(out_z)


_EDGE_STRUCT = "array<struct<x1:double,y1:double,x2:double,y2:double>>"


def _zones_literal(zidx: "ZoneIndex"):
    """The zone set as one literal array<struct<fid, env, edges>> —
    the shape the whole-stage-codegen point path filters per row.
    Edge values come from the SAME rings_to_edges tables the numpy
    probe uses, so both paths test identical doubles."""
    zs = []
    for pos in range(len(zidx.fids)):
        x1, y1, x2, y2 = zidx.edges[pos]
        env = zidx.envs[pos]
        if len(x1):
            edges = F.array(*[
                F.struct(
                    F.lit(float(a)).alias("x1"), F.lit(float(b)).alias("y1"),
                    F.lit(float(c)).alias("x2"), F.lit(float(d)).alias("y2"),
                )
                for a, b, c, d in zip(x1, y1, x2, y2)
            ])
        else:
            edges = F.array().cast(_EDGE_STRUCT)
        zs.append(F.struct(
            F.lit(int(zidx.fids[pos])).cast("long").alias("fid"),
            F.lit(float(env[0])).alias("minx"), F.lit(float(env[1])).alias("miny"),
            F.lit(float(env[2])).alias("maxx"), F.lit(float(env[3])).alias("maxy"),
            edges.alias("edges"),
        ))
    return F.array(*zs)


def spatial_join(
    docs: DataFrame,
    zones: DataFrame,
    wkt_col: str = "wkt",
    fid_col: str = "fid",
    zone_wkt_col: str = "wkt",
    first_match: bool = False,
    how: str = "inner",
    project: list[str] | None = None,
) -> DataFrame:
    """Broadcast spatial join: docs rows x zones whose polygon
    intersects the doc geometry (exact, GEOS-equivalent).

    zones is the SMALL side by contract (ogr2ogr method-layer /
    OGR SQL secondary-table role). The polygon set is indexed once on
    the driver and shipped as one broadcast; each Arrow batch of docs
    probes it in numpy — no shuffle of the big side at all, which is
    the whole game at 10^12 docs.

    first_match=True reproduces OGR SQL JOIN semantics exactly: one
    output row per doc, matched to the LOWEST zone fid
    (ogr_gensql.cpp:1515-1546 takes the first feature in secondary FID
    order, 1:1 never 1:N). how='left' null-extends unmatched docs.

    project: optional output column list (mapInPandas is opaque to
    Catalyst, so downstream column pruning can't reach the probe —
    this is the manual pruning knob). When project excludes the WKT
    column and envelope columns are present, POINT rows additionally
    ship a NULL instead of their WKT through the Arrow crossing (the
    probe needs only their envelope): at 10^12 docs the crossing then
    carries 4 doubles + ids per point, no strings either way.
    """
    spark = docs.sparkSession
    zidx = ZoneIndex.from_df(zones, fid_col=fid_col, wkt_col=zone_wkt_col)
    bc = spark.sparkContext.broadcast(zidx)

    has_env = all(c in docs.columns for c in ("env_minx", "env_miny", "env_maxx", "env_maxy"))

    # -- whole-stage-codegen point path -------------------------------
    # For small zone sets the entire even-odd ray cast compiles into
    # Catalyst: the zone edge tables become ONE literal
    # array<struct<fid, env, edges>> and each POINT row evaluates
    # filter/aggregate lambdas over it — same float expression order as
    # points_in_edges (crossing rule, strict xint > px, on-edge
    # closure), so the match set is bit-identical — with NO Python
    # worker, no Arrow crossing, and no serialized broadcast for the
    # point majority. Non-points (and NULL/empty rows) keep the
    # numpy probe. Division by zero inside the lambda is gated by a
    # when(crosses, ...) — Spark orders NaN ABOVE all doubles, so an
    # unguarded NaN xint would count phantom crossings numpy masks out.
    total_edges = sum(len(e[0]) for e in zidx.edges)
    use_jvm_points = (
        has_env and 0 < total_edges <= 2048 and len(zidx.fids) > 0
    )
    if use_jvm_points:
        pt_cond = (
            (F.col("env_minx") == F.col("env_maxx"))
            & (F.col("env_miny") == F.col("env_maxy"))
            & F.col(wkt_col).startswith("POINT")
        )
        pt_docs = docs.filter(pt_cond)
        docs = docs.filter(~F.coalesce(pt_cond, F.lit(False)))
        out_cols_jvm = list(project) if project is not None else list(docs.columns)
        px, py = F.col("env_minx"), F.col("env_miny")

        def _inside(z):
            env_ok = (
                (px >= z["minx"]) & (px <= z["maxx"])
                & (py >= z["miny"]) & (py <= z["maxy"])
            )
            def _hit(e):
                crosses = (e["y1"] <= py) != (e["y2"] <= py)
                xint = e["x1"] + (py - e["y1"]) * (e["x2"] - e["x1"]) / (e["y2"] - e["y1"])
                return crosses & F.when(crosses, xint > px).otherwise(F.lit(False))
            parity = F.size(F.filter(z["edges"], _hit)) % 2 == 1
            def _on(e):
                return (
                    ((e["x2"] - e["x1"]) * (py - e["y1"])
                     - (e["y2"] - e["y1"]) * (px - e["x1"]) == 0)
                    & (F.least(e["x1"], e["x2"]) <= px)
                    & (px <= F.greatest(e["x1"], e["x2"]))
                    & (F.least(e["y1"], e["y2"]) <= py)
                    & (py <= F.greatest(e["y1"], e["y2"]))
                )
            return env_ok & (parity | F.exists(z["edges"], _on))

        fids = F.transform(
            F.filter(_zones_literal(zidx), _inside), lambda z: z["fid"]
        )
        if first_match:
            zf = F.array_min(fids).alias("zone_fid")
            jvm_out = pt_docs.select(*out_cols_jvm, zf)
            if how != "left":
                jvm_out = jvm_out.filter(F.col("zone_fid").isNotNull())
        else:
            ex = F.explode_outer(fids) if how == "left" else F.explode(fids)
            jvm_out = pt_docs.select(*out_cols_jvm, ex.alias("zone_fid"))
    else:
        jvm_out = None
    if project is not None:
        missing = [c for c in project if c not in docs.columns]
        if missing:
            raise ValueError(f"project columns not in docs: {missing}")
        need = list(dict.fromkeys(list(project) + (
            ["env_minx", "env_miny", "env_maxx", "env_maxy"] if has_env else []
        )))
        if has_env and wkt_col not in project:
            # JVM-side WKT strip for points: their exact test is pure
            # envelope (probe_points); null is near-free in Arrow
            pt_jvm = (
                (F.col("env_minx") == F.col("env_maxx"))
                & (F.col("env_miny") == F.col("env_maxy"))
                & F.col(wkt_col).startswith("POINT")
            )
            docs = docs.select(
                *need,
                F.when(pt_jvm, F.lit(None).cast("string")).otherwise(F.col(wkt_col)).alias(wkt_col),
            )
        elif wkt_col not in need:
            docs = docs.select(*need, wkt_col)
        else:
            docs = docs.select(*need)
        out_cols = list(project)
    else:
        out_cols = list(docs.columns)

    out_schema = StructType([docs.schema[c] for c in out_cols] + [StructField("zone_fid", LongType())])

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        zi: ZoneIndex = bc.value
        for pdf in batches:
            if has_env:
                di, zpos = _probe_with_env(zi, pdf, wkt_col)
            else:
                batch = parse_wkt(pdf[wkt_col])
                di, zpos = zi.probe_batch(batch)
            if first_match and di.size:
                # lowest secondary fid per doc row
                fids = zi.fids[zpos]
                order = np.lexsort((fids, di))
                di, fids = di[order], fids[order]
                keep = np.concatenate([[True], di[1:] != di[:-1]])
                di, fids = di[keep], fids[keep]
            else:
                fids = zi.fids[zpos]
            matched = pdf.iloc[di][out_cols].copy()
            matched["zone_fid"] = pd.array(fids, dtype="Int64")
            if how == "left":
                unmatched_mask = np.ones(len(pdf), dtype=bool)
                unmatched_mask[np.unique(di)] = False
                un = pdf.iloc[unmatched_mask][out_cols].copy()
                un["zone_fid"] = pd.array([None] * len(un), dtype="Int64")
                matched = pd.concat([matched, un], ignore_index=True)
            yield matched

    probed = docs.mapInPandas(_probe, out_schema)
    return probed if jvm_out is None else probed.unionByName(jvm_out)


def _probe_with_env(zi: "ZoneIndex", pdf: pd.DataFrame, wkt_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Probe using precomputed envelope columns: POINT rows go through
    the vectorized R-tree+ray-cast path with NO WKT parsing at all;
    only non-point rows (typically a small minority) are parsed. This
    keeps the 10^12-doc hot loop entirely in numpy.

    A row with a VALID degenerate envelope but NULL wkt is a point
    whose WKT was stripped JVM-side by spatial_join(project=...) —
    envelopes derive from wkt, so that combination cannot occur
    naturally (null wkt => NaN envelope => invalid)."""
    minx = pdf["env_minx"].to_numpy(dtype=np.float64)
    miny = pdf["env_miny"].to_numpy(dtype=np.float64)
    maxx = pdf["env_maxx"].to_numpy(dtype=np.float64)
    maxy = pdf["env_maxy"].to_numpy(dtype=np.float64)
    valid = ~np.isnan(minx)
    wkt_s = pdf[wkt_col]
    is_pt = (
        valid
        & (minx == maxx)
        & (miny == maxy)
        & (wkt_s.str.startswith("POINT").fillna(False) | wkt_s.isna()).to_numpy()
    )
    out_d: list[np.ndarray] = []
    out_z: list[np.ndarray] = []
    pt_idx = np.flatnonzero(is_pt)
    if pt_idx.size:
        pi, zpos = zi.probe_points(minx[pt_idx], miny[pt_idx])
        out_d.append(pt_idx[pi])
        out_z.append(zpos)
    other_idx = np.flatnonzero(valid & ~is_pt)
    if other_idx.size:
        batch = parse_wkt(pdf[wkt_col].iloc[other_idx])
        di, zpos = zi.probe_batch(batch)
        out_d.append(other_idx[di])
        out_z.append(zpos)
    if not out_d:
        e = np.empty(0, dtype=np.int64)
        return e, e
    return np.concatenate(out_d), np.concatenate(out_z)


def attach_zone_attrs(joined: DataFrame, zones: DataFrame, fid_col: str = "fid", prefix: str = "zone_") -> DataFrame:
    """Attach zone attributes post-join via a Catalyst broadcast
    equi-join on fid (the reference prefixes colliding names with
    input_/method_, ogrlayer.cpp:5200-5230 — we prefix zone attrs)."""
    z = zones
    for c in z.columns:
        if c != fid_col:
            z = z.withColumnRenamed(c, f"{prefix}{c}")
    return joined.join(F.broadcast(z), joined["zone_fid"] == z[fid_col], "left").drop(fid_col)


# ---------------------------------------------------------------------------
# layer algebra: clip to rectangle (ogr2ogr -clipsrc / OGRLayer::Clip)


def _clip_ring_rect(ring: np.ndarray, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
    """Sutherland-Hodgman clip of one ring against an axis-parallel
    rectangle — for convex clip windows this equals GEOS
    Intersection's boundary (ogrlayer.cpp:7537 Clip uses GEOS; the
    rect case is exactly S-H)."""
    poly = ring
    for axis, bound, keep_ge in ((0, minx, True), (0, maxx, False), (1, miny, True), (1, maxy, False)):
        if len(poly) == 0:
            return poly
        out = []
        n = len(poly)
        for i in range(n):
            cur, nxt = poly[i], poly[(i + 1) % n]
            cin = (cur[axis] >= bound) if keep_ge else (cur[axis] <= bound)
            nin = (nxt[axis] >= bound) if keep_ge else (nxt[axis] <= bound)
            if cin:
                out.append(cur)
            if cin != nin:
                t = (bound - cur[axis]) / (nxt[axis] - cur[axis])
                p = cur + t * (nxt - cur)
                p[axis] = bound  # exact on the clip edge
                out.append(p)
        poly = np.asarray(out) if out else np.empty((0, 2))
    if len(poly):
        poly = np.vstack([poly, poly[:1]])  # close
    return poly


def clip_to_rect(
    df: DataFrame,
    rect: tuple[float, float, float, float],
    wkt_col: str = "wkt",
    out_col: str = "clip_wkt",
) -> DataFrame:
    """Clip every geometry to rect; rows whose intersection is empty
    are DROPPED (ogr2ogr -clipsrc drops features clipped away,
    apps/ogr2ogr_lib.cpp:6969-7010). Points pass through iff inside
    (closed). Polygons are S-H clipped; the envelope fast path skips
    the kernel for fully-inside geometries."""
    from gdal_spark.geom.wkt import to_wkt
    from gdal_spark.geom.batch import GeomBatchBuilder

    minx, miny, maxx, maxy = (float(v) for v in rect)

    # stage 1: envelope reject, JVM-side when env columns exist
    if "env_minx" in df.columns:
        df = df.filter(
            (F.col("env_maxx") >= minx)
            & (F.col("env_maxy") >= miny)
            & (F.col("env_minx") <= maxx)
            & (F.col("env_miny") <= maxy)
        )

    out_schema = StructType(df.schema.fields + [StructField(out_col, StringType())])

    def _clip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            batch = parse_wkt(pdf[wkt_col])
            env = batch.envelopes()
            keep_idx: list[int] = []
            out_wkt: list[str] = []
            fully_inside = (
                (env[:, 0] >= minx) & (env[:, 1] >= miny) & (env[:, 2] <= maxx) & (env[:, 3] <= maxy)
            )
            for i in range(len(batch)):
                if batch.is_null[i] or np.isnan(env[i, 0]):
                    continue
                if env[i, 2] < minx or env[i, 0] > maxx or env[i, 3] < miny or env[i, 1] > maxy:
                    continue
                if fully_inside[i]:
                    keep_idx.append(i)
                    out_wkt.append(pdf[wkt_col].iloc[i])
                    continue
                gtype, parts = batch.geometry(i)
                if gtype in (GeomType.POINT, GeomType.MULTIPOINT):
                    pts = np.concatenate([rings[0] for rings in parts], axis=0)
                    inside = (pts[:, 0] >= minx) & (pts[:, 0] <= maxx) & (pts[:, 1] >= miny) & (pts[:, 1] <= maxy)
                    if not inside.any():
                        continue
                    b = GeomBatchBuilder()
                    kept = pts[inside]
                    if len(kept) == 1:
                        b.add(GeomType.POINT, [[kept[:1]]])
                    else:
                        b.add(GeomType.MULTIPOINT, [[kept[j : j + 1]] for j in range(len(kept))])
                    keep_idx.append(i)
                    out_wkt.append(to_wkt(b.finish())[0])
                elif gtype in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
                    new_parts = []
                    for rings in parts:
                        new_rings = [
                            c for c in (_clip_ring_rect(r, minx, miny, maxx, maxy) for r in rings) if len(c) >= 4
                        ]
                        if new_rings:
                            new_parts.append(new_rings)
                    if not new_parts:
                        continue
                    b = GeomBatchBuilder()
                    if len(new_parts) == 1:
                        b.add(GeomType.POLYGON, new_parts)
                    else:
                        b.add(GeomType.MULTIPOLYGON, new_parts)
                    keep_idx.append(i)
                    out_wkt.append(to_wkt(b.finish())[0])
                elif gtype in (GeomType.LINESTRING, GeomType.MULTILINESTRING):
                    # ogr2ogr -clipsrc on line layers
                    # (ogr2ogr_lib.cpp:6969): split at the window
                    # boundary, keep inside pieces (boundary-riding
                    # parts count as inside — closed region)
                    from gdal_spark.geom.overlay import clip_line

                    rect_ring = np.array(
                        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]]
                    )
                    pieces: list[np.ndarray] = []
                    for rings in parts:
                        pieces.extend(clip_line(rings[0], [[rect_ring]], keep_inside=True))
                    if not pieces:
                        continue
                    b = GeomBatchBuilder()
                    if len(pieces) == 1:
                        b.add(GeomType.LINESTRING, [[pieces[0]]])
                    else:
                        b.add(GeomType.MULTILINESTRING, [[ln] for ln in pieces])
                    keep_idx.append(i)
                    out_wkt.append(to_wkt(b.finish())[0])
            res = pdf.iloc[keep_idx].copy()
            res[out_col] = out_wkt
            yield res

    return df.mapInPandas(_clip, out_schema)


# ---------------------------------------------------------------------------
# big x big spatial join (cell-partitioned, no broadcast)


def spatial_join_cells(
    docs: DataFrame,
    zones: DataFrame,
    grid,
    doc_id_col: str = "_id",
    zone_fid_col: str = "fid",
    zone_wkt_col: str = "wkt",
    wkt_col: str = "wkt",
    salt: int = 0,
    verify_salt: int = 8,
    broadcast_zones: bool | None = None,
    broadcast_zone_limit: int = 100_000,
) -> DataFrame:
    """Spatial join for zone sets too large to broadcast: both sides
    are exploded to covering grid cells, equi-joined on cell id, and
    exact-verified per pair; duplicate (doc, zone) pairs from
    multi-cell overlaps are dropped with one dropDuplicates.

    This is the explicit repartition-by-cell contract of the north
    rule: the shuffle key is the cell id (optionally salted for hot
    cells), zones with huge envelopes fan out to their covering
    cells, and each task sees only its cell's candidates. Docs with
    envelope columns explode JVM-side (sequence/explode); the exact
    verify is the same numpy batch kernel as the broadcast join.

    Shuffle diet (same rule as lsh_pairs, dedup.py): the (cell, salt)
    exchange and the pair dedup carry ONLY (cell, _did, _zfid) plus
    two booleans — at 10^12 docs this is the heaviest exchange in the
    big x big path and WKT strings must not ride it (a zone's WKT
    would otherwise be duplicated once per candidate pair).
    Geometries re-join by id AFTER the dedup, zone side last on a
    salted key (_zfid, hash(_did) % verify_salt) so the verify stage
    parallelism is zones x verify_salt, not capped at the distinct
    zone count (the verify kernel groups by _zfid inside each Arrow
    batch, so it needs no co-partitioning for correctness).

    Exchange-count adaptivity (broadcast_zones: None = probe): when
    the zone table is small enough to broadcast (a limit-probe
    count, CollectLimit-bounded like graph.py's guard), the plan
    collapses to ONE exchange on the fat path — the classified zone
    cells and the zone WKTs broadcast, the candidate stream
    repartitions by _did alone (hash(_did) satisfies the
    groupBy(_did, _zfid) clustering AND the doc-WKT left join's key,
    so neither adds an exchange), and no verify salt is needed
    because the verify stage inherits hash(_did) parallelism. With
    genuinely huge zone sets (probe over the limit, or
    broadcast_zones=False) the shuffle plan above applies, still
    with the repartition-by-_did reuse for the doc-WKT join. At
    2M docs x 10 zones the broadcast plan measures 4.5 s vs 7.9 s at
    local[8] and removes the flat-above-8-cores exchange chain.

    Interior-cell fast accept (the prepared-geometry "containment
    shortcut" of the reference's R-tree joins, done at grid
    granularity): the zone side classifies each covering cell as
    BOUNDARY (a ring edge passes through it — the all-touched walk of
    llrasterize.cpp) or INTERIOR (no edge, center inside); cells
    outside the polygon are dropped entirely (fewer candidates than
    the envelope box). A candidate whose envelope lies inside an
    interior cell is an exact match by construction (env subset of
    cell subset of zone), so it is accepted JVM-side — its WKT never
    shuffles and it never reaches the Python verify. Only
    boundary-cell candidates (a perimeter fraction that shrinks as
    the grid refines) pay for geometry.

    Returns (doc_id, zone_fid) pairs."""
    from gdal_spark.operators.cells import Grid  # noqa: F401 (type)

    # docs side: cell ids from envelope columns (JVM-side). The
    # exchange carries ids + the point's coordinates (2 doubles — a
    # POINT's coords ARE its envelope): the point majority then needs
    # NO doc-side geometry re-join at all before the verify, only the
    # non-point minority joins its WKT back. Shipping 16 extra bytes
    # per candidate row removes an entire shuffle of the full doc
    # table from the verify stage.
    pt_jvm = (
        (F.col("env_minx") == F.col("env_maxx"))
        & (F.col("env_miny") == F.col("env_maxy"))
        & F.col(wkt_col).startswith("POINT")
    )
    d = docs.select(
        F.col(doc_id_col).alias("_did"),
        "env_minx", "env_miny", "env_maxx", "env_maxy",
    ).filter(F.col("env_minx").isNotNull())

    def cell_range(minx, miny, maxx, maxy):
        cx0 = F.least(F.greatest(F.floor((minx - grid.minx) / grid.cell_w), F.lit(0)), F.lit(grid.nx - 1))
        cx1 = F.least(F.greatest(F.floor((maxx - grid.minx) / grid.cell_w), F.lit(0)), F.lit(grid.nx - 1))
        cy0 = F.least(F.greatest(F.floor((miny - grid.miny) / grid.cell_h), F.lit(0)), F.lit(grid.ny - 1))
        cy1 = F.least(F.greatest(F.floor((maxy - grid.miny) / grid.cell_h), F.lit(0)), F.lit(grid.ny - 1))
        return cx0, cx1, cy0, cy1

    cx0, cx1, cy0, cy1 = cell_range(F.col("env_minx"), F.col("env_miny"), F.col("env_maxx"), F.col("env_maxy"))
    cell_x0 = F.lit(grid.minx) + F.col("_cx") * F.lit(grid.cell_w)
    cell_y0 = F.lit(grid.miny) + F.col("_cy") * F.lit(grid.cell_h)
    d = (
        d.withColumn("_cx", F.explode(F.sequence(cx0, cx1)))
        .withColumn("_cy", F.explode(F.sequence(cy0, cy1)))
        .withColumn("cell", (F.col("_cy") * grid.nx + F.col("_cx")).cast("long"))
        # envelope fits this very cell's box: eligible for the
        # interior-cell fast accept (pure Catalyst, no Python)
        .withColumn(
            "_cont",
            (F.col("env_minx") >= cell_x0)
            & (F.col("env_maxx") <= cell_x0 + F.lit(grid.cell_w))
            & (F.col("env_miny") >= cell_y0)
            & (F.col("env_maxy") <= cell_y0 + F.lit(grid.cell_h)),
        )
        .select(
            "_did", "cell", "_cont",
            F.col("env_minx").alias("_px"), F.col("env_miny").alias("_py"),
        )
    )

    # zones side: classify each covering cell boundary/interior,
    # drop outside cells (one Arrow batch per zone partition)
    z = zones.select(
        F.col(zone_fid_col).alias("_zfid"), F.col(zone_wkt_col).alias("_zwkt")
    ).mapInPandas(
        _zone_cell_classifier(grid), "cell long, _zfid long, _boundary boolean"
    )

    # broadcast probe: CollectLimit-bounded, so a 10^6-zone table
    # costs one short scan, not a full count
    if broadcast_zones is None:
        broadcast_zones = (
            zones.limit(broadcast_zone_limit + 1).count() <= broadcast_zone_limit
        )

    if salt > 1 and not broadcast_zones:
        # hot-cell skew mitigation: the doc side takes a deterministic
        # per-row salt, the (small-per-cell) zone side replicates across
        # all salt values — the join key becomes (cell, salt) so a hot
        # cell's candidates spread over `salt` tasks. (Moot when the
        # zone cells broadcast: a broadcast join has no hot partition.)
        # pmod, not abs(hash) % n: abs(Integer.MIN_VALUE) stays negative in
        # non-ANSI mode and Spark % keeps the dividend's sign — a doc
        # hashing to MIN_VALUE would get a salt matching no replicated
        # zone row and silently vanish from the join
        d = d.withColumn("_salt", F.pmod(F.hash("_did"), F.lit(salt)).cast("int"))
        z = z.withColumn(
            "_salt", F.explode(F.array(*[F.lit(s).cast("int") for s in range(salt)]))
        )
        joined = d.join(z, ["cell", "_salt"])
    elif broadcast_zones:
        joined = d.join(F.broadcast(z), "cell")
    else:
        joined = d.join(z, "cell")

    # pair dedup doubles as the accept/verify split: a pair is
    # accepted outright if ANY of its candidate cells is an interior
    # cell that contains the doc's envelope. The accepted pairs stay
    # IN the pipeline as an _acc flag instead of forking a second
    # DataFrame branch: a filter(_acc)/filter(~_acc) fork + union
    # recomputes the whole explode->classify->join->agg subtree twice
    # (Catalyst canonicalization did not reuse the exchanges —
    # measured ReusedExchange=0, ~2x the work and the single biggest
    # local[8]->[32] scaling killer of the r4 shape).
    # ONE explicit repartition by _did alone: hash(_did) is a valid
    # clustering for groupBy(_did, _zfid) (every pair of a doc lands
    # in one partition) AND for the doc-WKT left join's _did key, so
    # the aggregate and that join both run exchange-free on top of it
    # — one fat exchange where the r4 plan paid three
    agg = (
        joined.select(
            "_did", "_zfid",
            (F.col("_cont") & ~F.col("_boundary")).alias("_acc"),
            "_px", "_py",
        )
        .repartition(F.col("_did"))
        .groupBy("_did", "_zfid")
        .agg(
            F.max("_acc").alias("_acc"),
            # constant per doc — first() just carries them through
            F.first("_px").alias("_px"),
            F.first("_py").alias("_py"),
        )
    )

    # geometry payloads re-join by id post-dedup, and cross the Arrow
    # boundary ONLY for the boundary-cell candidates: each surviving
    # doc/zone WKT crosses the wire once per unverified pair (not once
    # per covering cell x salt, and not at all for interior accepts —
    # the post-join projection nulls their WKT JVM-side, so the join
    # key stays the plain id with no NULL-key hot partition while the
    # Arrow payload for accepted rows is two nulls). The zone join key
    # is (_zfid, verify-salt): partitioning the verify stage by _zfid
    # alone caps its parallelism at the number of DISTINCT ZONES
    # TOUCHED — with a handful of hot zones most cores idle (measured:
    # 14.3 s at local[8] vs 14.6 s at local[32], zero 8->32 scaling).
    # Salting by hash(_did) % verify_salt fans each zone's candidates
    # over verify_salt tasks; the (small per-zone) WKT replicates
    # verify_salt times, and the verify kernel never depended on
    # co-partitioning (it rebuilds edge tables per (_zfid) group per
    # Arrow batch), so correctness is unchanged.
    # Only the NON-POINT minority re-joins its WKT (a POINT's verify
    # coordinates already rode the candidate exchange as _px/_py, the
    # same rule as the broadcast join's project path :275-283). The
    # left join null-extends _dwkt for point pairs — the verify keys
    # its parse-free path off exactly that NULL.
    pairs = agg
    # SHUFFLE_HASH, not the default sort-merge: SMJ would sort the
    # ENTIRE pair stream by _did just to probe the non-point subset;
    # hash-building the bounded dwn slice per partition costs
    # O(|non-point|/nparts) memory and no sort of the fat side
    dwn = docs.filter(~pt_jvm).select(
        F.col(doc_id_col).alias("_did"), F.col(wkt_col).alias("_dwkt")
    ).hint("SHUFFLE_HASH")
    zw = zones.select(F.col(zone_fid_col).alias("_zfid"), F.col(zone_wkt_col).alias("_zwkt"))
    if broadcast_zones:
        # zone WKTs broadcast -> the verify stage keeps the hash(_did)
        # partitioning end-to-end: full parallelism, no verify salt,
        # zero additional exchanges on the pair stream
        paired = pairs.join(dwn, "_did", "left").join(F.broadcast(zw), "_zfid")
    elif verify_salt > 1:
        pairs = pairs.withColumn(
            "_vs", F.pmod(F.hash("_did"), F.lit(verify_salt)).cast("int")
        )
        zw = zw.withColumn(
            "_vs",
            F.explode(F.array(*[F.lit(s).cast("int") for s in range(verify_salt)])),
        )
        paired = pairs.join(dwn, "_did", "left").join(zw, ["_zfid", "_vs"]).drop("_vs")
    else:
        paired = pairs.join(dwn, "_did", "left").join(zw, "_zfid")
    # interior-accepted pairs need no geometry at all: null both WKTs
    # AFTER the joins (plain-id join keys — no NULL-key hot partition)
    # so the Arrow exchange ships them as (ids, flag, 2 nulls)
    paired = paired.withColumn(
        "_dwkt", F.when(~F.col("_acc"), F.col("_dwkt"))
    ).withColumn("_zwkt", F.when(~F.col("_acc"), F.col("_zwkt")))

    out_schema = StructType(
        [StructField("doc_id", LongType()), StructField("zone_fid", LongType())]
    )

    def _verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.reset_index(drop=True)
            acc = pdf["_acc"].to_numpy(bool)
            # Interior-accepted rows (both WKTs nulled JVM-side) keep
            # unconditionally and touch nothing below. Of the rest,
            # NULL _dwkt rows are the JVM-stripped points: their
            # coordinates ride as _px/_py and nothing parses. Only the
            # non-point minority builds a GeomBatch (positions mapped
            # through `sub_of`).
            parsed = pdf["_dwkt"].notna().to_numpy()
            stripped = ~parsed & ~acc
            px = pdf["_px"].to_numpy(np.float64)
            py = pdf["_py"].to_numpy(np.float64)
            sub_of = np.cumsum(parsed) - 1  # pdf idx -> dbatch idx
            dbatch = parse_wkt(pdf.loc[parsed, "_dwkt"]) if parsed.any() else None
            if dbatch is not None:
                parsed_pt = (dbatch.types == GeomType.POINT) & ~dbatch.is_empty
            keep = acc.copy()
            # group by zone: build each zone's edge table once; the
            # point-geometry majority goes through ONE vectorized ray
            # cast per zone (same path as the broadcast join,
            # probe_points), only non-point rows verify pairwise
            pending = pdf.loc[~acc, ["_zfid", "_zwkt"]]
            for _zfid, grp in pending.groupby("_zfid", sort=False):
                zbatch = parse_wkt(grp["_zwkt"].iloc[:1])
                rings = zbatch.polygon_rings(0)
                edges = rings_to_edges(rings)
                idx = grp.index.to_numpy()
                # points: JVM-stripped ones + any parsed POINT rows
                is_pt_row = stripped[idx]
                if dbatch is not None:
                    is_pt_row = is_pt_row | (
                        parsed[idx] & parsed_pt[sub_of[idx]]
                    )
                pts = idx[is_pt_row]
                if pts.size:
                    xs = px[pts].copy()
                    ys = py[pts].copy()
                    parsed_pts = pts[~stripped[pts]]
                    if parsed_pts.size:
                        si = sub_of[parsed_pts]
                        first_ring = dbatch.part_ring_off[dbatch.geom_part_off[si]]
                        cidx = dbatch.ring_coord_off[first_ring]
                        rel = ~stripped[pts]
                        xs[rel] = dbatch.coords[cidx, 0]
                        ys[rel] = dbatch.coords[cidx, 1]
                    keep[pts] = points_in_edges(xs, ys, edges)
                for i in idx[~is_pt_row]:
                    keep[int(i)] = batch_intersects_rings(
                        dbatch, int(sub_of[int(i)]), rings, edges
                    )
            res = pdf.loc[keep]
            yield pd.DataFrame({"doc_id": res["_did"].to_numpy(np.int64), "zone_fid": res["_zfid"].to_numpy(np.int64)})

    # the groupBy made pairs unique and every pair flows through the
    # one verify stage (accepted rows as a pass-through flag) — a
    # single linear plan, no union, nothing computed twice
    return paired.mapInPandas(_verify, out_schema)


def _zone_cell_classifier(grid, max_cells: int = 4_000_000):
    """Returns the mapInPandas fn: (_zfid, _zwkt) rows -> one row per
    covering grid cell with a boundary/interior classification.
    Boundary = a ring edge passes through the cell (the all-touched
    supercover walk of llrasterize.cpp GDALdllImageLineAllTouched);
    interior = no edge and cell center inside (even-odd, holes
    respected); outside cells are dropped. Zones whose covering-cell
    count exceeds `max_cells` (mask memory guard), or that fail to
    parse as polygons, fall back to every envelope cell as boundary —
    always-correct, never-accepting."""

    def _cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.operators.raster import _all_touched_line_mask

        for pdf in batches:
            zb = parse_wkt(pdf["_zwkt"])
            env = zb.envelopes()
            out_cell: list[np.ndarray] = []
            out_zfid: list[np.ndarray] = []
            out_bnd: list[np.ndarray] = []
            for i in range(len(pdf)):
                zfid = int(pdf["_zfid"].iloc[i])
                minx, miny, maxx, maxy = env[i]
                if not np.isfinite(minx):
                    continue
                gx0 = int(np.clip(np.floor((minx - grid.minx) / grid.cell_w), 0, grid.nx - 1))
                gx1 = int(np.clip(np.floor((maxx - grid.minx) / grid.cell_w), 0, grid.nx - 1))
                gy0 = int(np.clip(np.floor((miny - grid.miny) / grid.cell_h), 0, grid.ny - 1))
                gy1 = int(np.clip(np.floor((maxy - grid.miny) / grid.cell_h), 0, grid.ny - 1))
                W, H = gx1 - gx0 + 1, gy1 - gy0 + 1
                try:
                    rings = zb.polygon_rings(i)
                except Exception:
                    rings = []
                if not rings or W * H > max_cells:
                    cys, cxs = np.mgrid[gy0 : gy1 + 1, gx0 : gx1 + 1]
                    cells = (cys.ravel() * grid.nx + cxs.ravel()).astype(np.int64)
                    out_cell.append(cells)
                    out_zfid.append(np.full(cells.size, zfid, dtype=np.int64))
                    out_bnd.append(np.ones(cells.size, dtype=bool))
                    continue
                bmask = np.zeros((H, W), dtype=bool)
                for ring in rings:
                    rc = np.column_stack((
                        (ring[:, 0] - grid.minx) / grid.cell_w,
                        (ring[:, 1] - grid.miny) / grid.cell_h,
                    ))
                    bmask |= _all_touched_line_mask(rc, H, W, oy=gy0, ox=gx0)
                keep_y, keep_x = np.nonzero(bmask)
                out_cell.append(((keep_y + gy0) * grid.nx + (keep_x + gx0)).astype(np.int64))
                out_zfid.append(np.full(keep_y.size, zfid, dtype=np.int64))
                out_bnd.append(np.ones(keep_y.size, dtype=bool))
                iy, ix = np.nonzero(~bmask)
                if iy.size:
                    edges = rings_to_edges(rings)
                    ctr_x = grid.minx + (ix + gx0 + 0.5) * grid.cell_w
                    ctr_y = grid.miny + (iy + gy0 + 0.5) * grid.cell_h
                    inside = points_in_edges(ctr_x, ctr_y, edges)
                    out_cell.append(((iy[inside] + gy0) * grid.nx + (ix[inside] + gx0)).astype(np.int64))
                    out_zfid.append(np.full(int(inside.sum()), zfid, dtype=np.int64))
                    out_bnd.append(np.zeros(int(inside.sum()), dtype=bool))
            if out_cell:
                yield pd.DataFrame({
                    "cell": np.concatenate(out_cell),
                    "_zfid": np.concatenate(out_zfid),
                    "_boundary": np.concatenate(out_bnd),
                })

    return _cells
