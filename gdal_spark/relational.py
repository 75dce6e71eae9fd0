"""Relational-layer wrappers mapping OGR dataset-level operators onto
Catalyst built-ins (SURVEY.md §2.7 / §2.1):

* union_layers      — OGRUnionLayer (ogrunionlayer.cpp): schema-
                      reconciling union (missing fields null-filled)
* concat_layers     — `gdal vector concat` (strict same-schema union)
* first_match_join  — OGR SQL JOIN semantics (ogr_gensql.cpp:1515):
                      exactly the first secondary feature by FID
* partition_write   — `gdal vector partition --scheme hive`
                      (gdalalg_vector_partition.cpp): hive-layout
                      writer with the lineage sidecar
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from gdal_spark.metrics import write_snapshot


def union_layers(layers: Sequence[DataFrame]) -> DataFrame:
    out = layers[0]
    for df in layers[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def concat_layers(layers: Sequence[DataFrame]) -> DataFrame:
    out = layers[0]
    for df in layers[1:]:
        out = out.unionByName(df)
    return out


def first_match_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    fid_col: str | None = None,
    how: str = "left",
    broadcast_right: bool = True,
) -> DataFrame:
    """1:1 join to the FIRST matching right row in fid order. The
    dedup happens on the (usually small) right side BEFORE the join,
    so the big left side streams through a broadcast join unshuffled."""
    fid = fid_col or right.columns[0]
    w = Window.partitionBy(right_on).orderBy(fid)
    first = right.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    if broadcast_right:
        first = F.broadcast(first)
    return left.join(first, left[left_on] == first[right_on], how)


def partition_write(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    job_id: str = "partition-write",
    max_records_per_file: int | None = None,
    scheme: str = "hive",
    pattern: str | None = None,
    layer_name: str = "layer",
    omit_partitioned_fields: bool = False,
) -> dict:
    """`gdal vector partition` (apps/gdalalg_vector_partition.cpp).

    scheme="hive" (default): key directories `field=value/...` — the
    layout Spark's partitionBy writes natively, including the
    `__HIVE_DEFAULT_PARTITION__` NULL marker (:31). feature-limit maps
    to maxRecordsPerFile (the executors enforce it during the write —
    no second pass).

    scheme="flat": every part file lands in ONE directory named by the
    pattern, default `{LAYER_NAME}_{FIELD_VALUE}_%010d` (:35; or
    `{LAYER_NAME}_%010d` with no partition fields), FIELD_VALUE =
    key values joined by '_' with NULL -> `__NULL__` (:461-469), a
    1-based per-key counter in the single %0Nd slot (:477-505). The
    heavy lifting (hashing rows to their partition, encoding values)
    stays on executors via the same hive write; the flat layout is a
    metadata-only per-FILE rename pass on the committed output — one
    rename per part file, never touching row data.
    """
    if max_records_per_file:
        df.sparkSession.conf.set("spark.sql.files.maxRecordsPerFile", str(max_records_per_file))
    if scheme not in ("hive", "flat"):
        raise ValueError("scheme must be 'hive' or 'flat'")
    # hive + parquet forces omit-partitioned-fields (:821-825, required
    # for parquet hive partitioning — Spark's native behavior). The
    # flat DEFAULT keeps partitioned fields in the data files: route
    # the split through DUPLICATED key columns so partitionBy consumes
    # the copies and the originals stay in every row.
    pb = list(partition_cols)
    if scheme == "flat" and partition_cols and not omit_partitioned_fields:
        pb = [f"_pk_{c}" for c in partition_cols]
        for c, d in zip(partition_cols, pb):
            df = df.withColumn(d, F.col(c))
    rec = write_snapshot(df, path, job_id, partition_by=pb)
    if scheme == "flat":
        import os
        import re
        import shutil

        if pattern is None:
            pattern = "{LAYER_NAME}_{FIELD_VALUE}_%010d" if partition_cols else "{LAYER_NAME}_%010d"
        slots = list(re.finditer(r"%(0?)(\d*)d", pattern))
        if len(slots) != 1:
            raise ValueError("pattern must contain a single %[0N]d slot")
        m = slots[0]
        digits = int(m.group(2) or 0)
        zero = m.group(1) == "0" or (m.group(2) or "").startswith("0")
        # split the PATTERN at the %d slot BEFORE substituting, like
        # the reference (:474-485 osPatternPrefix/Suffix) — a field
        # value containing a hive-escaped '%' (e.g. 'x%d' -> 'x%25d')
        # must never be mistaken for the counter slot
        pat_prefix, pat_suffix = pattern[: m.start()], pattern[m.end():]

        def subst(s: str, field_value: str) -> str:
            return s.replace("{LAYER_NAME}", layer_name).replace(
                "{FIELD_VALUE}", field_value
            )

        counters: dict = {}
        renames = []
        for f in sorted(rec["files"], key=lambda r: r["file"]):
            rel = f["file"]
            parts = rel.split(os.sep)[:-1]
            vals = []
            for p in parts:
                _k, _, v = p.partition("=")
                vals.append("__NULL__" if v == "__HIVE_DEFAULT_PARTITION__" else v)
            # counter keyed by the SUBSTITUTED name stem, not the hive
            # key path: '_' is not hive-escaped, so two distinct keys
            # can join to the same FIELD_VALUE (('x_y','z') vs
            # ('x','y_z')) — per-key counters would then both emit
            # ..._0000000001 and the second rename would silently
            # overwrite the first file; per-stem counters give the
            # collider counter 2 instead
            fv = "_".join(vals)
            stem = (subst(pat_prefix, fv), subst(pat_suffix, fv))
            counters[stem] = counters.get(stem, 0) + 1
            c = str(counters[stem])
            if len(c) < digits:
                c = ("0" if zero else " ") * (digits - len(c)) + c
            name = stem[0] + c + stem[1] + ".parquet"
            renames.append((rel, name))
        for rel, name in renames:
            shutil.move(os.path.join(path, rel), os.path.join(path, name))
        # drop the emptied key directories (after the data-file moves
        # they hold only local-FS .crc sidecars)
        roots = {os.path.join(path, rel.split(os.sep)[0]) for rel, _ in renames if os.sep in rel}
        for d in roots:
            if os.path.isdir(d):
                shutil.rmtree(d)
        for f, (_, name) in zip(sorted(rec["files"], key=lambda r: r["file"]), renames):
            f["file"] = name
        # rewrite the _lineage.json sidecar: write_snapshot stamped it
        # with the pre-rename hive-relative paths, which no longer exist
        import json

        from gdal_spark.metrics import LINEAGE_FILE

        with open(os.path.join(path, LINEAGE_FILE), "w") as fh:
            json.dump(rec, fh, indent=1)
    return rec


def combine(
    df: DataFrame,
    group_by: Sequence[str],
    wkt_col: str = "wkt",
    order_col: str | None = None,
    add_extra_fields: str = "no",
    extra_fields: Sequence[str] = (),
) -> DataFrame:
    """`gdal vector combine` (apps/gdalalg_vector_combine.cpp): group
    features by field(s) and merge their geometries into ONE
    multi-geometry per group — all members the same atomic type ->
    MultiPoint/MultiLineString/MultiPolygon, mixed ->
    GEOMETRYCOLLECTION; multipart members contribute their COMPONENTS
    (the reference's default; keep-nested — nesting collections
    inside the output — is out of scope: the flat GC model here
    cannot represent nesting). NULL/invalid geometries are skipped.

    add_extra_fields='always-identical' copies each extra field whose
    value is identical within EVERY group (the reference's SQLITE
    MIN==MAX probe becomes one Catalyst aggregate over the same
    groupBy — no second scan shape).

    Distributed shape: ONE groupBy shuffle carrying each geometry
    once (plus the small key/order columns); assembly is an Arrow
    pass over the aggregated rows. order_col pins member order inside
    the multi (the reference preserves source order; Spark input
    order is nondeterministic without it)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    from gdal_spark.geom.batch import GeomBatchBuilder, GeomType
    from gdal_spark.geom.wkt import parse_wkt, to_wkt

    keys = list(group_by)
    order = F.col(order_col) if order_col else F.monotonically_increasing_id()
    aggs = [
        F.array_sort(F.collect_list(F.struct(order.alias("o"), F.col(wkt_col).alias("w"))))
        .alias("_members")
    ]
    extras = [c for c in extra_fields if c not in keys]
    for c in extras:
        aggs.append(F.min(c).alias(f"_min_{c}"))
        aggs.append(F.max(c).alias(f"_max_{c}"))
    g = df.groupBy(*keys).agg(*aggs)
    g = g.withColumn("_wkts", F.transform(F.col("_members"), lambda s: s["w"])).drop("_members")

    if add_extra_fields == "always-identical" and extras:
        # a field is copied only if min==max (or all-null) in EVERY group
        probe = g.select(
            *[
                (F.min((F.col(f"_min_{c}") == F.col(f"_max_{c}")) | F.col(f"_min_{c}").isNull()))
                .alias(c)
                for c in extras
            ]
        ).first()
        keep = [c for c in extras if probe[c]]
    elif add_extra_fields == "sometimes-identical":
        keep = extras  # per-group: non-identical groups get NULL below
    else:
        keep = []

    out_fields = [StructField(c, df.schema[c].dataType) for c in keys]
    for c in keep:
        out_fields.append(StructField(c, df.schema[c].dataType))
    out_fields.append(StructField(wkt_col, StringType()))
    out_schema = StructType(out_fields)

    per_group = add_extra_fields == "sometimes-identical"

    def _assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                wkts = [w for w in r["_wkts"] if w is not None]
                members = []
                if wkts:
                    batch, errs = parse_wkt(pd.Series(wkts), return_errors=True)
                    for j in range(len(wkts)):
                        if errs[j] is not None or batch.is_null[j]:
                            continue
                        members.extend(batch.collection_members(j))
                b = GeomBatchBuilder()
                if not members:
                    wkt_out = None
                else:
                    mtypes = {mt for mt, _ in members}
                    if len(mtypes) == 1:
                        mt = next(iter(mtypes))
                        multi = {
                            GeomType.POINT: GeomType.MULTIPOINT,
                            GeomType.LINESTRING: GeomType.MULTILINESTRING,
                            GeomType.POLYGON: GeomType.MULTIPOLYGON,
                        }[mt]
                        b.add(multi, [rings for _, rings in members])
                    else:
                        b.add_collection(members)
                    wkt_out = to_wkt(b.finish())[0]
                row = {k: r[k] for k in keys}
                for c in keep:
                    mn, mx = r[f"_min_{c}"], r[f"_max_{c}"]
                    row[c] = mn if (not per_group or mn == mx or (pd.isna(mn) and pd.isna(mx))) else None
                row[wkt_col] = wkt_out
                rows.append(row)
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in out_fields])

    return g.mapInPandas(_assemble, out_schema)


# ---------------------------------------------------------------------------
# `gdal vector set-field-type` — OGRFeature::SetFrom coercions


_INT32_MIN, _INT32_MAX = -2147483648, 2147483647
_INT64_MIN, _INT64_MAX = -9223372036854775808, 9223372036854775807


def set_field_type(df: DataFrame, field: str, new_type: str) -> DataFrame:
    """`gdal vector set-field-type`
    (apps/gdalalg_vector_set_field_type.cpp): retype one field with
    OGRFeature::SetFrom/SetField coercion semantics
    (ogr/ogrfeature.cpp:3981 SetField(double), :4181 SetField(char*)):

      string -> int/bigint  strtoll/CPLAtoGIntBig PREFIX parse (leading
                            spaces + sign + digits; no digits -> 0),
                            clamped to the integer range
      string -> double      CPLStrtod prefix parse (decimal/exponent
                            forms; no parse -> 0.0)
      double -> int/bigint  truncate toward zero, clamp to range,
                            NaN -> type minimum (:3997-4004)
      double -> string      C "%.16g" (:4083) — one Arrow pass, the
                            only non-Catalyst conversion (JVM printf
                            %g is not C %g)
      int    -> string      "%d" (Spark cast matches)
      bigint -> int         clamp to int32 range

    NULL (OGR unset) stays NULL through every conversion. new_type in
    {"string", "int", "bigint", "double"} (the OGR core types; list /
    date coercions are format-specific and out of scope)."""
    src = dict(df.dtypes)[field]
    col = F.col(field)
    if new_type not in ("string", "int", "bigint", "double"):
        raise ValueError(f"unsupported target type {new_type!r}")
    if src == new_type:
        return df

    if new_type in ("int", "bigint"):
        lo, hi = (_INT32_MIN, _INT32_MAX) if new_type == "int" else (_INT64_MIN, _INT64_MAX)
        if src == "string":
            # strtoll prefix: optional whitespace, sign, digits
            digits = F.regexp_extract(col, r"^\s*([+-]?[0-9]+)", 1)
            as64 = F.when(digits == "", F.lit(0)).otherwise(
                # beyond-int64 literals clamp (strtoll ERANGE); DECIMAL(38)
                # carries the magnitude so the comparison is exact, and
                # beyond-38-SIGNIFICANT-digit literals (decimal cast ->
                # NULL) clamp by sign — leading zeros stripped first so
                # zero-padded small numbers parse instead of clamping
                F.when(F.length(F.regexp_replace(digits, r"^[+-]?0*", "")) > 38,
                       F.when(digits.startswith("-"), F.lit(lo)).otherwise(F.lit(hi)))
                .when(digits.cast("decimal(38,0)") > hi, F.lit(hi))
                .when(digits.cast("decimal(38,0)") < lo, F.lit(lo))
                .otherwise(digits.cast("bigint"))
            )
            conv = F.when(col.isNull(), F.lit(None)).otherwise(
                F.greatest(F.least(as64.cast("bigint"), F.lit(hi)), F.lit(lo))
            ).cast(new_type)
        elif src == "double":
            conv = (
                F.when(col.isNull(), F.lit(None).cast(new_type))
                .when(F.isnan(col), F.lit(lo).cast(new_type))
                .when(col < lo, F.lit(lo).cast(new_type))
                .when(col > hi, F.lit(hi).cast(new_type))
                .otherwise(col.cast(new_type))
            )
        else:  # int <-> bigint (greatest/least skip NULLs -> guard)
            conv = F.when(col.isNull(), F.lit(None).cast(new_type)).otherwise(
                F.greatest(F.least(col.cast("bigint"), F.lit(hi)), F.lit(lo)).cast(new_type))
    elif new_type == "double":
        if src == "string":
            # CPLStrtod prefix: decimal with optional exponent
            num = F.regexp_extract(col, r"^\s*([+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)", 1)
            conv = F.when(col.isNull(), F.lit(None)).otherwise(
                F.when(num == "", F.lit(0.0)).otherwise(num.cast("double"))
            ).cast("double")
        else:
            conv = col.cast("double")
    else:  # string
        if src == "double":
            import pandas as pd
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("string")
            def _g16(v):
                # NULL rows reach the UDF as NaN (float64 has no NULL);
                # the outer when() masks them back to NULL, so a real
                # NaN VALUE correctly formats as "nan"
                return pd.Series([f"{x:.16g}" for x in v])

            conv = F.when(col.isNull(), F.lit(None)).otherwise(_g16(col))
        else:
            conv = col.cast("string")

    return df.withColumn(field, conv)


def select_fields(df: DataFrame, fields: Sequence[str], exclude: bool = False,
                  ignore_missing: bool = False) -> DataFrame:
    """`gdal vector select` (apps/gdalalg_vector_select.cpp): keep (or
    with exclude=True drop) the named fields, in the requested order;
    an unknown name errors unless ignore_missing (--ignore-missing-
    fields). Pure Catalyst projection — column pruning reaches the
    scan."""
    have = set(df.columns)
    missing = [f for f in fields if f not in have]
    if missing and not ignore_missing:
        raise ValueError(f"field(s) not found: {missing}")
    wanted = [f for f in fields if f in have]
    if exclude:
        drop = set(wanted)
        return df.select(*[c for c in df.columns if c not in drop])
    return df.select(*wanted)

def vector_update(
    dst: DataFrame,
    src: DataFrame,
    keys: Sequence[str] | None = None,
    mode: str = "merge",
    fid_col: str = "_id",
) -> DataFrame:
    """`gdal vector update` (apps/gdalalg_vector_update.cpp:169-346):
    keyed upsert of src features into dst.  The reference replays src
    features sequentially against the LIVE dst layer; the distributed
    form below is the closed-form of that replay (proved case-by-case
    in tests/test_vector_update.py against a literal sequential
    simulator):

      * key = field list (--key, types String/Integer/Integer64/Real
        only, :172-205) or FID (the default, :164; GetFeature lookup
        :242-246).  A src feature with ANY unset key field is skipped
        (:250-255).
      * a src feature matches iff EXACTLY ONE dst feature carries its
        key (:286-297: a second GetNextFeature() resets the match —
        ambiguous keys fall through to the append branch).
      * matched + mode merge/update-only: the dst feature is rewritten
        via OGRFeature::SetFrom keeping its FID (:313-324) — shared
        fields take src values, dst-only fields go null.  Sequential
        replay => the LAST src feature (FID order) wins.
      * unmatched + mode merge: the FIRST src feature of the key
        appends one new feature (:333-343); later src rows of the same
        key then match it (count 1) and SetFrom it => one appended row
        at the first row's position carrying the LAST row's fields.
      * unmatched + mode append-only: the first src row appends; later
        rows match it but append-only never updates => the FIRST row's
        fields survive.
      * ambiguous (>= 2 dst matches): EVERY src row appends (each
        append only grows the match count, keeping it ambiguous);
        update-only appends nothing anywhere.

    Appended features get FIDs max(dst)+1.. in creation order (=
    first-src-FID order), via the dense_seq range-bucket rank — no
    single-partition window.  In FID-match mode a later src feature
    whose FID equals a freshly ASSIGNED one matches it live
    (GetFeature hits the new row) — the closed form of that
    interaction is derived inline at the fid_match append branch.
    Output schema = dst schema.  One dst-side key count + one key
    equi-join; at scale src is typically the small side
    (broadcastable by AQE)."""
    if mode not in ("merge", "update-only", "append-only"):
        raise ValueError(f"unknown mode {mode!r}")
    fid_match = not keys or list(keys) == ["FID"]
    key_cols = [fid_col] if fid_match else list(keys)
    for k in key_cols:
        if k not in src.columns:
            raise ValueError(f"Cannot find field '{k}' in input layer")
        if k not in dst.columns:
            raise ValueError(f"Cannot find field '{k}' in output layer")
        st = src.schema[k].dataType.simpleString()
        dt = dst.schema[k].dataType.simpleString()
        if not fid_match:
            if st not in ("string", "int", "bigint", "double"):
                raise ValueError(
                    f"Type of field '{k}' is not one of those supported "
                    "for a key field: String, Integer, Integer64, Real"
                )
            if st != dt:
                raise ValueError(
                    f"Type of field '{k}' is not the same in input and "
                    "output layers"
                )

    cond = F.lit(True)
    for k in key_cols:
        cond = cond & F.col(k).isNotNull()
    s = src.filter(cond)

    # dst-side match cardinality per key (FID is unique: always 1)
    cnts = dst.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_cnt"))

    # first/last src row per key, by src FID order (struct min/max —
    # FID leads, so the struct order IS the FID order)
    others = [c for c in s.columns if c != fid_col]
    per_key = s.groupBy(*key_cols).agg(
        F.min(F.struct(F.col(fid_col), *[F.col(c) for c in others])).alias("_first"),
        F.max(F.struct(F.col(fid_col), *[F.col(c) for c in others])).alias("_last"),
    )

    shared = [c for c in dst.columns if c in src.columns and c != fid_col]
    dst_only = [c for c in dst.columns if c not in src.columns and c != fid_col]

    # --- update path: keys with exactly one dst match ---------------
    if mode == "append-only":
        updated = dst
    else:
        upd = per_key.join(cnts, key_cols).filter(F.col("_cnt") == 1).select(
            *key_cols, F.col("_last").alias("_u")
        )
        j = dst.join(upd, key_cols, "left")
        cols = []
        for c in dst.columns:
            if c == fid_col or c in key_cols:
                cols.append(F.col(c))
            elif c in shared:
                cols.append(
                    F.when(F.col("_u").isNotNull(), F.col("_u")[c]).otherwise(F.col(c)).alias(c)
                )
            else:  # dst-only field: SetFrom leaves it unset (null)
                cols.append(
                    F.when(F.col("_u").isNotNull(), F.lit(None)).otherwise(F.col(c)).alias(c)
                )
        updated = j.select(*cols)

    # --- append path -------------------------------------------------
    if mode == "update-only":
        return updated

    max_fid = dst.agg(F.max(fid_col).alias("m")).first().m
    base = (max_fid if max_fid is not None else -1) + 1
    from gdal_spark.operators.vector_sort import dense_seq

    with_cnt = per_key.join(cnts, key_cols, "left").withColumn(
        "_cnt", F.coalesce(F.col("_cnt"), F.lit(0))
    )

    def _emit(appends: DataFrame) -> DataFrame:
        app_cols = []
        for c in dst.columns:
            if c == fid_col:
                app_cols.append(
                    F.col("_fid").cast(dst.schema[fid_col].dataType).alias(c))
            elif c in shared or c in key_cols:
                app_cols.append(F.col(f"_row.{c}").alias(c))
            else:
                app_cols.append(F.lit(None).cast(dst.schema[c].dataType).alias(c))
        return updated.unionByName(appends.select(*app_cols))

    if fid_match:
        # Closed form of the live-layer FID interaction: CreateFeature
        # assigns max+1.. (SetFrom unset the FID, :333-343), so a LATER
        # src feature whose FID equals a freshly assigned one MATCHES it
        # via GetFeature (:242-246).  Since src iterates in FID order,
        # src FIDs are unique, and the assigned-FID watermark only
        # grows: holes (f < base, f not in dst) all append FIRST taking
        # FIDs base..base+H-1 in f order; src rows with
        # base <= f < base+H then match those appended features (merge
        # SetFroms them — the f-th assigned FID is exactly f — while
        # append-only leaves them); and once f clears the watermark
        # (f >= base+H) every later row appends, because a strictly
        # increasing f can never fall back under a watermark that grows
        # by one per append.  Proved against the sequential simulator
        # in tests/test_vector_update.py (colliding cases included).
        miss = with_cnt.filter(F.col("_cnt") == 0).select(
            F.col(f"_first.{fid_col}").alias("_f"), F.col("_first").alias("_row"))
        holes = miss.filter(F.col("_f") < base)
        n_holes = holes.count()
        holes = dense_seq(holes, "_f", "_f", out_col="_seq").select(
            (F.lit(base) + F.col("_seq")).alias("_fid"), "_row")
        if mode == "merge":
            coll = miss.filter(
                (F.col("_f") >= base) & (F.col("_f") < base + n_holes)
            ).select(F.col("_f").alias("_fid"), F.col("_row").alias("_crow"))
            holes = holes.join(coll, "_fid", "left").select(
                "_fid", F.coalesce(F.col("_crow"), F.col("_row")).alias("_row"))
        tail = dense_seq(
            miss.filter(F.col("_f") >= base + n_holes), "_f", "_f", out_col="_seq"
        ).select((F.lit(base + n_holes) + F.col("_seq")).alias("_fid"), "_row")
        return _emit(holes.unionByName(tail))

    pick = "_first" if mode == "append-only" else "_last"
    app_new = with_cnt.filter(F.col("_cnt") == 0).select(
        F.col(f"_first.{fid_col}").alias("_ord"),
        F.col(pick).alias("_row"),
    )
    # ambiguous keys: every src row appends, in its own FID position
    amb = with_cnt.filter(F.col("_cnt") >= 2).select(*key_cols)
    app_amb = s.join(amb, key_cols).select(
        F.col(fid_col).alias("_ord"),
        F.struct(F.col(fid_col), *[F.col(c) for c in others]).alias("_row"),
    )
    appends = dense_seq(
        app_new.unionByName(app_amb), "_ord", "_ord", out_col="_seq"
    ).select((F.lit(base) + F.col("_seq")).alias("_fid"), "_row")
    return _emit(appends)
