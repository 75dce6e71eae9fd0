"""The production job: spatial-join + tiling over an interleaved-docs
table, launched via

    spark-submit --py-files build/gdal_spark.zip \
        gdal_spark/jobs/spatial_tile_job.py \
        --docs <parquet/iceberg path or synth:N> --out <dir> \
        [--resume] [--zoom Z]

Implements the full north-rule operational contract:
  * reads the (doc_id, spans) table (or synthesizes N docs),
  * extracts WKT geometries (errors routed, never dropped),
  * broadcast R-tree spatial join against the zone set,
  * explodes docs to tile keys and burns a per-tile doc-count raster,
  * writes three snapshots (join result, tile table, error rows),
    each with a _lineage.json sidecar (per-file row counts),
  * --resume: skips tile keys already present in the tile snapshot
    (broadcast anti-join on done keys),
  * prints a one-line JSON run report (rows, tiles, wall seconds).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from gdal_spark.datagen import docs_table, zones_table  # noqa: E402
from gdal_spark.metrics import anti_join_done, resume_done_keys, write_snapshot  # noqa: E402
from gdal_spark.operators.raster import RasterSpec, rasterize  # noqa: E402
from gdal_spark.operators.spatial import extract_geom, spatial_join  # noqa: E402
from gdal_spark.operators.tiles import tile_keys_for_envelopes  # noqa: E402

GRID = RasterSpec(
    width=4096, height=4096, gt=(440720.0, 1200.0 / 4096, 0.0, 3751320.0, 0.0, -1200.0 / 4096),
    dtype="int32", nbands=1, tile_size=256,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="input parquet path or synth:<N>")
    ap.add_argument("--out", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--shuffle", type=int, default=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")))
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("gdal_spark-spatial-tile")
        .config("spark.sql.shuffle.partitions", str(args.shuffle))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()

    if args.docs.startswith("synth:"):
        docs = docs_table(spark, n=int(args.docs.split(":", 1)[1]))
        inputs = [args.docs]
    else:
        docs = spark.read.parquet(args.docs)
        inputs = [args.docs]

    extracted = extract_geom(docs)
    keep = [c for c in ("doc_id", "_id") if c in extracted.columns]
    geom = extracted.select(
        *keep, "wkt", "env_minx", "env_miny", "env_maxx", "env_maxy", "geom_error"
    )

    # 1. error rows snapshot (invalid WKT routed, never dropped)
    errors = geom.filter(F.col("geom_error").isNotNull()).select(*keep, "geom_error")
    err_rec = write_snapshot(errors, f"{args.out}/errors", "spatial-tile:errors", inputs=inputs)

    ok = geom.filter(F.col("geom_error").isNull())

    # 2. spatial join snapshot
    joined = spatial_join(ok, zones_table(spark)).select(*keep, "zone_fid")
    join_rec = write_snapshot(joined, f"{args.out}/join", "spatial-tile:join", inputs=inputs)

    # 3. tile burn snapshot with --resume (anti-join on done tile keys)
    shapes = ok.filter(F.col("env_minx") == F.col("env_maxx")).select(
        F.col(keep[-1]).alias("fid") if keep else F.monotonically_increasing_id().alias("fid"),
        "wkt",
        "env_minx", "env_miny", "env_maxx", "env_maxy",
        F.array(F.lit(1.0)).alias("burn_values"),
    )
    from gdal_spark.metrics import read_lineage

    tiles = rasterize(
        shapes, GRID, merge_alg="add",
        env_cols=("env_minx", "env_miny", "env_maxx", "env_maxy"),
    )
    done = resume_done_keys(spark, f"{args.out}/tiles", ["ty", "tx"]) if args.resume else None
    todo = anti_join_done(tiles, done, ["ty", "tx"])
    mode = "append" if (args.resume and done is not None) else "overwrite"
    prev = read_lineage(f"{args.out}/tiles") if mode == "append" else None
    tile_rec = write_snapshot(todo, f"{args.out}/tiles", "spatial-tile:tiles", inputs=inputs, mode=mode)

    print(
        json.dumps(
            {
                "errors": err_rec["row_count"],
                "join_rows": join_rec["row_count"],
                "tiles_total": tile_rec["row_count"],
                "tiles_new": tile_rec["row_count"] - (prev["row_count"] if prev else 0),
                "resumed": bool(args.resume and done is not None),
                "wall_s": round(time.time() - t0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
