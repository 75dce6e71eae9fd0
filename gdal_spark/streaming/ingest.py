"""Structured Streaming ingestion for the interleaved-docs pipeline.

The reference is a batch library (SURVEY.md §2.10: no watermarks, no
event-time state); its closest analogs are the streamed one-feature
pipeline (apps/gdalalg_vector_pipeline.cpp), --resume tile generation
and incremental CreateFeature appends. Here those become first-class
Structured Streaming:

* stream_docs_from_rate — a deterministic interleaved-docs stream:
  the `rate` source's monotonically increasing `value` drives the
  exact same id->spans/WKT arithmetic as the batch generator
  (datagen.docs_table), so streaming results are comparable with
  batch oracles row-for-row.
* stream_spatial_join — the broadcast R-tree probe is stateless
  per-row, so the SAME operator (mapInPandas over Arrow batches)
  runs unchanged on a streaming DataFrame: one engine, two runners.
* windowed_zone_counts — event-time tumbling-window counts per zone
  with a watermark for late data.
* write_stream_with_lineage — foreachBatch sink appending parquet
  snapshots with the per-batch lineage sidecar (metrics.py), giving
  the stream the same resume/rows-accounting contract as batch jobs;
  checkpointLocation provides exactly-once per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gdal_spark.datagen import docs_table
from gdal_spark.operators.spatial import extract_geom, spatial_join


def stream_docs_from_rate(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Streaming interleaved docs: rate-source value -> doc id."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    ids = rate.select(F.col("value").alias("id"), F.col("timestamp").alias("event_ts"))
    return docs_table(spark, ids=ids)


def stream_docs_from_files(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-watch ingestion (incremental CreateFeature analog)."""
    return spark.readStream.schema(schema).parquet(path)


def stream_spatial_join(docs_stream: DataFrame, zones: DataFrame) -> DataFrame:
    """The batch spatial-join operator applied to a stream: extract
    WKT -> envelopes -> broadcast R-tree probe. Stateless, so no
    state store is involved; Spark simply runs the same Arrow-batched
    probe per micro-batch."""
    keep = [c for c in ("doc_id", "_id", "event_ts") if c in docs_stream.columns]
    g = extract_geom(docs_stream).select(
        *keep, "wkt", "env_minx", "env_miny", "env_maxx", "env_maxy", "geom_error"
    )
    return spatial_join(g, zones)


def windowed_zone_counts(
    joined: DataFrame,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Event-time tumbling window counts per zone; the watermark
    bounds state and admits late rows up to `watermark`."""
    return (
        joined.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "zone_fid")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "zone_fid", "n_docs")
    )


def write_stream_with_lineage(df: DataFrame, out_path: str, checkpoint: str, job_id: str):
    """foreachBatch sink: append each micro-batch as a parquet delta
    and refresh the lineage sidecar (row counts from committed
    footers). The checkpoint dir makes redelivery idempotent at the
    micro-batch level; the sidecar records per-file counts so a
    resumed stream can account for every committed row."""
    from gdal_spark.metrics import append_snapshot

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_snapshot(
            batch_df, out_path, job_id=f"{job_id}#batch{batch_id}", params={"batch_id": batch_id}
        )

    return (
        df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def stream_exact_dedup(docs_stream: "DataFrame", text_col: str = "text", id_col: str = "doc_id", n_shards: int = 64):
    """Stateful cross-batch exact dedup: the first doc with a given
    text hash passes, later duplicates are dropped — across ALL
    micro-batches, via the state store (applyInPandasWithState).

    State layout: keyed by a hash shard (n_shards groups), each
    holding the set of seen 60-bit text hashes. Sharding bounds
    per-key state size and spreads the state store across executors;
    at 10^12 docs use more shards + RocksDB state backend.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    hashed = docs_stream.withColumn(
        "_h", F.conv(F.substring(F.md5(F.col(text_col).cast("binary")), 1, 15), 16, 10).cast("long")
    ).withColumn("_shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int"))

    from pyspark.sql.types import ArrayType

    out_schema = StructType(
        [StructField(f.name, f.dataType) for f in hashed.schema.fields if f.name != "_shard"]
    )
    state_schema = StructType([StructField("seen", ArrayType(LongType()))])

    def _dedup(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            # vectorized first-occurrence: in-batch firsts via
            # duplicated(), cross-batch via isin(seen) — both C loops,
            # no per-row Python (the engine-wide rule)
            h = pdf["_h"]
            fresh = (~h.duplicated() & ~h.isin(seen)).to_numpy()
            out = pdf.iloc[fresh.nonzero()[0]].drop(columns=["_shard"])
            seen.update(int(v) for v in h.to_numpy()[fresh])
            if len(out):
                yield out
        state.update((list(seen),))

    return hashed.groupBy("_shard").applyInPandasWithState(
        _dedup, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
