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
) -> dict:
    """Hive-scheme partitioned write with lineage sidecar. The
    feature-limit option maps to maxRecordsPerFile."""
    if max_records_per_file:
        df.sparkSession.conf.set("spark.sql.files.maxRecordsPerFile", str(max_records_per_file))
    return write_snapshot(df, path, job_id, partition_by=list(partition_cols))
