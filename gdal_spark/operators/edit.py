"""`gdal raster edit` / `gdal vector edit` — metadata-plane editing.

Reference surface:
  apps/gdalalg_raster_edit.cpp   CRS override, bbox -> geotransform,
                                 per-band nodata / color interpretation /
                                 scale / offset (all= / band= / implicit
                                 list syntaxes with exact-count and
                                 mix-of-syntax validation), metadata
                                 set/unset, GCPs (inline tuples or a
                                 single-layer GCP vector dataset with
                                 required column/line/x/y fields),
                                 --stats/--hist
  apps/gdalalg_vector_edit.cpp   dataset/layer metadata set/unset, layer
                                 rename, CRS override WITHOUT
                                 reprojection, declared geometry-type
                                 override, --unset-fid

Design: in this engine a raster is (RasterSpec, tile DataFrame) and a
vector layer is a DataFrame; everything `edit` touches beyond the
geotransform lives in an auxiliary metadata record (the `.aux.json`
sidecar that dataset copy/rename/delete already carries,
fsops._dataset_paths).  Editing is therefore PURE METADATA — zero Spark
jobs, exactly like the reference's in-memory-VRT pipeline mode — except
--stats/--hist, which delegate to the existing distributed
raster_info/band_histogram operators.  Pixel payloads are never read or
rewritten; a 100 TB raster's CRS override costs one sidecar write.
"""

from __future__ import annotations

import dataclasses
import json
import posixpath
from typing import Mapping, Sequence

from pyspark.sql import DataFrame

from gdal_spark.operators.raster import RasterSpec

# GDALGetColorInterpretationName (gcore/gdal_misc.cpp:1244) — canonical
# spellings; matching is case-insensitive (GDALGetColorInterpretationByName)
_COLOR_INTERP = [
    "Undefined", "Gray", "Palette", "Red", "Green", "Blue", "Alpha",
    "Hue", "Saturation", "Lightness", "Cyan", "Magenta", "Yellow",
    "Black", "YCbCr_Y", "YCbCr_Cb", "YCbCr_Cr", "Pan", "Coastal",
    "RedEdge", "NIR", "SWIR", "MWIR", "LWIR", "TIR", "OtherIR",
    "SAR_Ka", "SAR_K", "SAR_Ku", "SAR_X", "SAR_C", "SAR_S", "SAR_L",
    "SAR_P",
]
_COLOR_BY_LOWER = {n.lower(): n for n in _COLOR_INTERP}


def _color_interp_of(s: str) -> str:
    """GDALGetColorInterpretationByName + the explicit 'undefined'
    escape (gdalalg_raster_edit.cpp:543-553)."""
    c = _COLOR_BY_LOWER.get(s.lower())
    if c is None:
        raise ValueError(f"Unsupported color interpretation: {s}")
    return c


def _per_band(values: Sequence[str], nbands: int, what: str,
              allow_bare_single: bool, parse) -> dict[int, object]:
    """The reference's shared per-band assignment grammar
    (gdalalg_raster_edit.cpp:540-745 color-interp branch and the
    ScaleOffsetSetterLambda): tokens are either 'all=<v>' (color
    interp) / a single bare value (scale/offset), '<band>=<v>', or an
    implicit positional list that must cover every band.  Syntaxes
    cannot mix; explicit band numbers must exist; an implicit list that
    is too long/short errors with the reference's wording."""
    out: dict[int, object] = {}
    if allow_bare_single and len(values) == 1 and "=" not in values[0]:
        v = parse(values[0])
        return {b: v for b in range(1, nbands + 1)}
    if (not allow_bare_single and len(values) == 1 and nbands > 1
            and not values[0].startswith("all=")):
        raise ValueError(
            "With several bands, specify as many color interpretation "
            "as bands, one or many values of the form "
            "<band_number>=<color> or a single value all=<color>")
    syntaxes = set()
    band_iter = 0
    for token in values:
        k, eq, v = token.partition("=")
        if eq and k == "all":
            syntaxes.add("all")
            pv = parse(v)
            for b in range(1, nbands + 1):
                out[b] = pv
        elif eq:
            syntaxes.add("explicit")
            try:
                nb = int(k)
            except ValueError:
                nb = 0
            if nb <= 0 or nb > nbands:
                raise ValueError(f"Invalid band number '{k}' in '{token}'")
            out[nb] = parse(v)
        else:
            syntaxes.add("implicit")
            band_iter += 1
            if band_iter > nbands:
                raise ValueError(
                    f"More {what} values specified than bands in the dataset")
            out[band_iter] = parse(token)
    if len(syntaxes) != 1:
        raise ValueError(f"Mix of different syntaxes to specify {what}")
    if "implicit" in syntaxes and band_iter != nbands:
        raise ValueError(
            f"Less {what} values specified than bands in the dataset")
    return out


_GCP_FIELDS = (("id", False), ("info", False), ("column", True),
               ("line", True), ("x", True), ("y", True), ("z", False))


def parse_gcps(gcps: Sequence[str] | None = None,
               gcp_layer: DataFrame | None = None) -> list[dict]:
    """ParseGCPs (gdalalg_raster_edit.cpp:240-319): inline
    'col,line,x,y[,z]' tuples, or a GCP vector layer with required
    fields column/line/x/y and optional id/info/z (missing required
    field errors with the reference's wording).  GCP sets are tiny by
    definition — the layer collect is broadcast-class, same convention
    as cutline/zone collects."""
    out: list[dict] = []
    if gcp_layer is not None:
        cols = set(gcp_layer.columns)
        for name, required in _GCP_FIELDS:
            if required and name not in cols:
                raise ValueError(f"Field '{name}' cannot be found in GCP layer")
        for r in gcp_layer.collect():
            d = r.asDict()
            gcp = {
                "id": str(d["id"]) if "id" in cols and d.get("id") is not None else "",
                "info": str(d["info"]) if "info" in cols and d.get("info") is not None else "",
                "pixel": float(d["column"]),
                "line": float(d["line"]),
                "x": float(d["x"]),
                "y": float(d["y"]),
                "z": float(d["z"]) if "z" in cols and d.get("z") is not None else 0.0,
            }
            out.append(gcp)
        return out
    for s in gcps or []:
        toks = [t for t in s.split(",") if t.strip() != ""]
        if len(toks) not in (4, 5):
            raise ValueError(
                f"Bad value for gcp: '{s}' (expected "
                "<pixel>,<line>,<easting>,<northing>[,<elevation>])")
        out.append({
            "id": "", "info": "",
            "pixel": float(toks[0]), "line": float(toks[1]),
            "x": float(toks[2]), "y": float(toks[3]),
            "z": float(toks[4]) if len(toks) == 5 else 0.0,
        })
    return out


def raster_edit(
    spec: RasterSpec,
    aux: Mapping | None = None,
    *,
    crs: str | None = None,
    bbox: Sequence[float] | None = None,
    nodata: str | float | None = None,
    color_interp: Sequence[str] | None = None,
    scale: Sequence[str] | str | None = None,
    offset: Sequence[str] | str | None = None,
    metadata: Mapping[str, str] | None = None,
    unset_metadata: Sequence[str] = (),
    unset_metadata_domain: Sequence[str] = (),
    gcps: Sequence[str] | None = None,
    gcp_layer: DataFrame | None = None,
) -> tuple[RasterSpec, dict]:
    """`gdal raster edit` (apps/gdalalg_raster_edit.cpp:322-871).
    Returns (new spec, new aux record); the tile table is untouched.
    Operations apply in the reference's order: CRS, bbox, nodata,
    color interp, scale, offset, metadata set/unset/unset-domain,
    GCPs (which take the CRS when both are given, :796-801)."""
    a = json.loads(json.dumps(dict(aux or {})))  # deep copy, json-plain

    have_gcps = bool(gcps) or gcp_layer is not None
    if crs is not None and not have_gcps:
        a["crs"] = None if crs in ("null", "none") else crs

    new_spec = spec
    if bbox is not None:
        if len(bbox) != 4:
            raise ValueError("bbox must be <xmin>,<ymin>,<xmax>,<ymax>")
        if spec.width == 0 or spec.height == 0:
            raise ValueError(
                "Cannot set extent because one of dataset height or width is null")
        gt = (float(bbox[0]), (float(bbox[2]) - float(bbox[0])) / spec.width,
              0.0, float(bbox[3]), 0.0,
              -(float(bbox[3]) - float(bbox[1])) / spec.height)
        new_spec = dataclasses.replace(spec, gt=gt)

    if nodata is not None:
        if isinstance(nodata, str) and nodata.lower() == "none":
            a.pop("nodata", None)
        else:
            a["nodata"] = float(nodata)

    if color_interp:
        got = _per_band(list(color_interp), spec.nbands, "color interpretation",
                        allow_bare_single=False, parse=_color_interp_of)
        ci = a.setdefault("color_interp", {})
        for b, v in got.items():
            ci[str(b)] = v

    for argname, vals in (("scale", scale), ("offset", offset)):
        if vals is None:
            continue
        if isinstance(vals, (str, float, int)):
            vals = [str(vals)]
        got = _per_band([str(v) for v in vals], spec.nbands, argname,
                        allow_bare_single=True, parse=float)
        d = a.setdefault(argname, {})
        for b, v in got.items():
            d[str(b)] = v

    # metadata lives as {domain: {key: value}}; --metadata writes the
    # default domain "", --unset-metadata-domain clears a whole domain
    # (SetMetadata(nullptr, domain), :780-787)
    if metadata:
        md = a.setdefault("metadata", {}).setdefault("", {})
        for k, v in metadata.items():
            md[str(k)] = str(v)
    for k in unset_metadata:
        a.get("metadata", {}).get("", {}).pop(k, None)
    for domain in unset_metadata_domain:
        a.get("metadata", {}).pop(domain, None)

    if have_gcps:
        parsed = parse_gcps(gcps, gcp_layer)
        if not parsed:
            raise ValueError("GCP list is empty")
        a["gcps"] = parsed
        if crs is not None and crs not in ("null", "none"):
            a["gcp_crs"] = crs

    return new_spec, a


def raster_edit_stats(tiles: DataFrame, spec: RasterSpec,
                      hist: bool = False):
    """--stats / --hist: the only data-plane part of the verb —
    delegates to the existing distributed exact-statistics and
    histogram operators (the reference's ComputeStatistics /
    GetHistogram calls, gdalalg_raster_edit.cpp:816-860)."""
    from gdal_spark.operators.info import raster_info

    stats = raster_info(tiles, spec)
    if not hist:
        return stats
    from pyspark.sql import functions as F

    from gdal_spark.operators.raster import band_histogram, default_histogram_range

    if spec.dtype in ("uint8", "int8"):
        mn, mx, buckets = default_histogram_range(spec.dtype)
        return stats, band_histogram(tiles, spec, mn, mx, buckets)
    # non-byte: per-band GetDefaultHistogram range from the band stats
    # (stats rows are nbands-small — broadcast-class collect)
    hists = None
    for r in stats.select("band", "min", "max").collect():
        mn, mx, buckets = default_histogram_range(spec.dtype, r.min, r.max)
        # pre-filter the scan to this band — the per-band predicate
        # pushes into the parquet read, so the loop costs ONE pass over
        # the raster total, not one pass per band
        h = band_histogram(
            tiles.filter(F.col("band") == r.band), spec, mn, mx, buckets
        ).filter(F.col("band") == r.band)
        hists = h if hists is None else hists.unionByName(h)
    return stats, hists


def vector_edit(
    df: DataFrame,
    aux: Mapping | None = None,
    *,
    layer_name: str | None = None,
    crs: str | None = None,
    geometry_type: str | None = None,
    metadata: Mapping[str, str] | None = None,
    unset_metadata: Sequence[str] = (),
    layer_metadata: Mapping[str, str] | None = None,
    unset_layer_metadata: Sequence[str] = (),
    unset_fid: bool = False,
    fid_col: str = "fid",
) -> tuple[DataFrame, dict]:
    """`gdal vector edit` (apps/gdalalg_vector_edit.cpp:161-339).
    Dataset/layer metadata set/unset, layer rename, CRS override
    WITHOUT reprojection (:44 — geometry coordinates are untouched;
    only the declared SRS changes), declared geometry-type override
    (feature geometries are NOT converted — that is set-geom-type's
    job), and --unset-fid (features lose their FID: the column drops
    so any downstream writer renumbers).  Pure metadata except the
    projection-only unset-fid; zero shuffles either way."""
    a = json.loads(json.dumps(dict(aux or {})))

    if layer_name is not None:
        a["layer_name"] = layer_name
    if crs is not None:
        a["crs"] = None if crs in ("null", "none") else crs
    if geometry_type is not None:
        a["geometry_type"] = geometry_type

    if metadata:
        md = a.setdefault("metadata", {})
        for k, v in metadata.items():
            md[str(k)] = str(v)
    for k in unset_metadata:
        a.get("metadata", {}).pop(k, None)
    if layer_metadata:
        md = a.setdefault("layer_metadata", {})
        for k, v in layer_metadata.items():
            md[str(k)] = str(v)
    for k in unset_layer_metadata:
        a.get("layer_metadata", {}).pop(k, None)

    out = df
    if unset_fid and fid_col in df.columns:
        out = df.drop(fid_col)
    return out, a


# ---------------------------------------------------------------------------
# .aux.json sidecar IO (the sidecar dataset copy/rename already carries)


def write_aux(path: str, aux: Mapping) -> None:
    from gdal_spark.operators.fsops import _fs_path

    fs, p = _fs_path(path)
    with fs.open_output_stream(p + ".aux.json") as f:
        f.write(json.dumps(dict(aux), indent=1).encode("utf-8"))


def read_aux(path: str) -> dict | None:
    from gdal_spark.operators.fsops import _fs_path, _info

    fs, p = _fs_path(path)
    side = p + ".aux.json"
    if _info(fs, side) is None:
        return None
    with fs.open_input_stream(side) as f:
        return json.loads(f.read().decode("utf-8"))
