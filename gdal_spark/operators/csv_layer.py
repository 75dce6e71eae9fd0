"""OGR CSV driver semantics over Spark's native (splittable,
distributed) CSV source.

Reference: /root/reference/ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp —
.csvt sidecar type list (line ~315: Integer / Integer64 / Real /
String / Date / Time / DateTime / WKT / CoordX / CoordY, each with an
optional "(width.precision)" suffix), geometry-as-WKT auto-detection
for columns named "WKT" or "_WKT*" (lines 553-576), the
X_POSSIBLE_NAMES / Y_POSSIBLE_NAMES / GEOM_POSSIBLE_NAMES open options
(lines 355-359), KEEP_GEOM_COLUMNS (ogrcsvdatasource.cpp:112), and the
writer's GEOMETRY=AS_WKT/AS_XY layer-creation options + CREATE_CSVT
(lines 1939-2063).

Scale design: the scan IS Spark's CSV datasource — splittable by byte
range, schema projection and filter pushdown native, nothing passes
through Python. This module only contributes the OGR semantics layer
on top: sidecar-driven casts and the geometry-column derivation (a
pure-Catalyst `concat` for X/Y points; the WKT column is already the
engine's geometry encoding). The single-file sink streams the
fid-sorted iterator (same driver contract as the shapefile/GPKG
sinks); the scale path is `distributed=True`, which writes a directory
of per-part CSVs (each with a header) that this reader and any CSV
tool read back directly.
"""

from __future__ import annotations

import os
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# .csvt sidecar
# ---------------------------------------------------------------------------

_CSVT_TO_SPARK = {
    "integer": "int", "integer64": "long", "real": "double",
    "string": "string", "date": "string", "time": "string",
    "datetime": "string", "wkt": "string", "coordx": "double",
    "coordy": "double", "jsonstringlist": "string",
}

_SPARK_TO_CSVT = {
    "tinyint": "Integer", "smallint": "Integer", "int": "Integer",
    "bigint": "Integer64", "long": "Integer64", "float": "Real",
    "double": "Real", "string": "String", "boolean": "Integer",
    "date": "Date", "timestamp": "DateTime",
}


def parse_csvt(text: str) -> list[str]:
    """One line of comma-separated OGR type declarations -> normalized
    lowercase type tokens with "(width.precision)" suffixes stripped."""
    out = []
    for tok in parse_csv_line(text.strip(), ","):
        base = re.sub(r"\s*\(.*\)\s*$", "", (tok or "").strip()).lower()
        out.append(base)
    return out


# ---------------------------------------------------------------------------
# RFC 4180 field codec (the writer's quoting + an independent parser
# used by tests and the driver codec query — the distributed read path
# is Spark's own CSV parser)
# ---------------------------------------------------------------------------


def escape_csv_field(v, sep: str = ",") -> str:
    if v is None:
        return ""
    s = str(v)
    if sep in s or '"' in s or "\n" in s or "\r" in s:
        return '"' + s.replace('"', '""') + '"'
    return s


def format_csv_line(values, sep: str = ",") -> str:
    return sep.join(escape_csv_field(v, sep) for v in values)


def parse_csv_line(line: str, sep: str = ",") -> list[str | None]:
    """Independent RFC 4180 parse of one record (may contain embedded
    newlines inside quoted fields). Empty unquoted field -> None,
    quoted empty -> ""."""
    out: list[str | None] = []
    i, n = 0, len(line)
    while True:
        if i < n and line[i] == '"':
            i += 1
            buf = []
            while i < n:
                if line[i] == '"':
                    if i + 1 < n and line[i + 1] == '"':
                        buf.append('"')
                        i += 2
                        continue
                    i += 1
                    break
                buf.append(line[i])
                i += 1
            out.append("".join(buf))
        else:
            j = i
            while j < n and line[j] != sep:
                j += 1
            out.append(line[i:j] if j > i else None)
            i = j
        if i >= n:
            return out
        assert line[i] == sep
        i += 1


# ---------------------------------------------------------------------------
# scan
# ---------------------------------------------------------------------------


def read_csv_layer(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    x_possible_names: tuple[str, ...] = (),
    y_possible_names: tuple[str, ...] = (),
    geom_possible_names: tuple[str, ...] = (),
    keep_geom_columns: bool = True,
    multi_line: bool = False,
) -> DataFrame:
    """OGR CSV layer scan: Spark's distributed CSV reader + the
    reference's geometry-column derivation. Output carries a `wkt`
    column when a geometry source is found (a column named WKT /
    _WKT* / in `geom_possible_names`, or an X+Y pair from
    `*_possible_names`); source geometry columns are dropped unless
    `keep_geom_columns` (the reference's default is keep)."""
    reader = (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("multiLine", multi_line)
        .option("escape", '"')
    )
    df = reader.csv(path)
    cols = df.columns

    # .csvt sidecar: positional type list (single-file paths only)
    types: list[str] = []
    if os.path.isfile(path):
        csvt = os.path.splitext(path)[0] + ".csvt"
        if os.path.exists(csvt):
            with open(csvt, encoding="utf-8") as fh:
                types = parse_csvt(fh.readline())
    if types:
        for i, c in enumerate(cols):
            if i < len(types):
                spark_t = _CSVT_TO_SPARK.get(types[i])
                if spark_t and spark_t != "string":
                    df = df.withColumn(c, F.col(c).cast(spark_t))

    lower = {c.lower(): c for c in cols}

    def _find(cands: tuple[str, ...]) -> str | None:
        for cand in cands:
            if cand.lower() in lower:
                return lower[cand.lower()]
        return None

    # geometry column: explicit candidates, then .csvt WKT type, then
    # the reference's WKT / _WKT* name auto-detection
    geom_col = _find(geom_possible_names)
    if geom_col is None and types:
        for i, c in enumerate(cols):
            if i < len(types) and types[i] == "wkt":
                geom_col = c
                break
    if geom_col is None:
        for c in cols:
            if c.upper() == "WKT" or c.upper().startswith("_WKT"):
                geom_col = c
                break

    if geom_col is not None:
        df = df.withColumn("wkt", F.col(geom_col).cast("string"))
        if not keep_geom_columns:
            df = df.drop(geom_col)
        return df

    xc, yc = _find(x_possible_names), _find(y_possible_names)
    if types and (xc is None or yc is None):
        for i, c in enumerate(cols):
            if i < len(types) and types[i] == "coordx" and xc is None:
                xc = c
            if i < len(types) and types[i] == "coordy" and yc is None:
                yc = c
    if xc is not None and yc is not None:
        x = F.col(xc).cast("double")
        y = F.col(yc).cast("double")
        # pure Catalyst: no Python crossing to build point WKT
        df = df.withColumn(
            "wkt",
            F.when(
                x.isNotNull() & y.isNotNull(),
                F.concat(
                    F.lit("POINT ("),
                    x.cast("string"), F.lit(" "), y.cast("string"),
                    F.lit(")"),
                ),
            ),
        )
        if not keep_geom_columns:
            df = df.drop(xc, yc)
    return df


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------


def write_csv_layer(
    df: DataFrame,
    path: str,
    wkt_col: str = "wkt",
    order_col: str | None = None,
    geometry: str = "AS_WKT",
    sep: str = ",",
    create_csvt: bool = True,
    distributed: bool = False,
) -> dict:
    """Sink with the reference's layer-creation semantics: the
    geometry column is written first as `WKT` (GEOMETRY=AS_WKT) or as
    X,Y doubles (AS_XY, point WKT only), plus a .csvt sidecar
    (CREATE_CSVT). `distributed=True` writes a directory of per-part
    CSVs via Spark's native writer (the 100 TB path); the default
    single-file mode streams the (optionally order_col-sorted)
    iterator on the driver."""
    attr_fields = [f for f in df.schema.fields if f.name != wkt_col]
    attr_names = [f.name for f in attr_fields]
    has_geom = wkt_col in df.columns

    if has_geom and geometry == "AS_WKT":
        out_df = df.select(F.col(wkt_col).alias("WKT"), *attr_names)
        csvt = ["WKT"]
    elif has_geom and geometry == "AS_XY":
        m = F.regexp_extract(
            F.col(wkt_col), r"^POINT \(([-0-9.eE+]+) ([-0-9.eE+]+)\)$", 1
        )
        my = F.regexp_extract(
            F.col(wkt_col), r"^POINT \(([-0-9.eE+]+) ([-0-9.eE+]+)\)$", 2
        )
        out_df = df.select(
            F.when(m != "", m).cast("double").alias("X"),
            F.when(my != "", my).cast("double").alias("Y"),
            *attr_names,
        )
        csvt = ["CoordX", "CoordY"]
    else:
        out_df = df.select(*attr_names)
        csvt = []
    csvt += [
        _SPARK_TO_CSVT.get(f.dataType.simpleString(), "String")
        for f in attr_fields
    ]

    if distributed:
        (
            out_df.write.mode("overwrite")
            .option("header", True)
            .option("sep", sep)
            .option("escape", '"')
            .csv(path)
        )
        if create_csvt:
            with open(os.path.join(path, "_schema.csvt"), "w", encoding="utf-8") as fh:
                fh.write(",".join(csvt) + "\n")
        return {"mode": "distributed", "columns": out_df.columns}

    header = format_csv_line(out_df.columns, sep)
    names = out_df.columns
    sep_b = sep

    def _fmt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = [
                format_csv_line(
                    [None if pd.isna(v) else v for v in row], sep_b
                )
                for row in pdf[names].itertuples(index=False)
            ]
            out = pd.DataFrame({"line": lines})
            if order_col is not None:
                out["_ord"] = pdf[order_col].values
            yield out

    if order_col is not None and order_col not in out_df.columns:
        raise ValueError("order_col must be one of the written columns")
    schema = "line string" + (", _ord long" if order_col is not None else "")
    lines_df = out_df.mapInPandas(_fmt, schema)
    if order_col is not None:
        lines_df = lines_df.orderBy("_ord")
    nrec = 0
    with open(path, "w", encoding="utf-8", newline="") as fh:
        fh.write(header + "\n")
        for row in lines_df.toLocalIterator():
            fh.write(row["line"] + "\n")
            nrec += 1
    if create_csvt:
        with open(os.path.splitext(path)[0] + ".csvt", "w", encoding="utf-8") as fh:
            fh.write(",".join(csvt) + "\n")
    return {"mode": "single", "records": nrec, "columns": names}
