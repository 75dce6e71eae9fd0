"""Structured Streaming tests: file-source micro-batches through the
SAME spatial-join operator as batch, windowed zone counts, and the
foreachBatch lineage sink (availableNow trigger -> deterministic)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gdal_spark.datagen import docs_table, zones_table
from gdal_spark.metrics import read_lineage
from gdal_spark.operators.spatial import extract_geom, spatial_join
from gdal_spark.streaming import stream_spatial_join, windowed_zone_counts, write_stream_with_lineage


@pytest.fixture()
def docs_dir(spark, tmp_path):
    path = str(tmp_path / "docs_in")
    docs_table(spark, n=300).withColumn(
        "event_ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("_id") % 25)
    ).write.parquet(path)
    return path


def _schema(spark, path):
    return spark.read.parquet(path).schema


class TestStreamJoin:
    def test_stream_matches_batch(self, spark, docs_dir, tmp_path):
        zones = zones_table(spark)
        stream = spark.readStream.schema(_schema(spark, docs_dir)).option("maxFilesPerTrigger", 1).parquet(docs_dir)
        joined = stream_spatial_join(stream, zones)
        q = (
            joined.select("_id", "zone_fid")
            .writeStream.format("memory")
            .queryName("joined_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {(r._id, r.zone_fid) for r in spark.sql("SELECT * FROM joined_stream").collect()}

        batch_g = extract_geom(docs_table(spark, n=300)).select(
            "_id", "wkt", "env_minx", "env_miny", "env_maxx", "env_maxy", "geom_error"
        )
        expected = {(r._id, r.zone_fid) for r in spatial_join(batch_g, zones).select("_id", "zone_fid").collect()}
        assert got == expected and len(got) > 0

    def test_windowed_counts_sum_to_total(self, spark, docs_dir):
        zones = zones_table(spark)
        stream = spark.readStream.schema(_schema(spark, docs_dir)).parquet(docs_dir)
        joined = stream_spatial_join(stream, zones)
        win = windowed_zone_counts(joined, window="10 seconds", watermark="30 seconds")
        # complete mode: append would hold windows open until the
        # watermark passes them, which never happens for a finite
        # availableNow run
        q = (
            win.writeStream.format("memory")
            .queryName("zone_windows")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM zone_windows").collect()
        batch_g = extract_geom(docs_table(spark, n=300)).select(
            "_id", "wkt", "env_minx", "env_miny", "env_maxx", "env_maxy", "geom_error"
        )
        total = spatial_join(batch_g, zones_table(spark)).count()
        assert sum(r.n_docs for r in rows) == total
        assert all(r.w_end > r.w_start for r in rows)

    def test_foreachbatch_lineage_sink(self, spark, docs_dir, tmp_path):
        zones = zones_table(spark)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        stream = spark.readStream.schema(_schema(spark, docs_dir)).parquet(docs_dir)
        joined = stream_spatial_join(stream, zones).select("_id", "zone_fid")
        q = write_stream_with_lineage(joined, out, ckpt, "stream-job").trigger(availableNow=True).start()
        q.awaitTermination(120)
        rec = read_lineage(out)
        assert rec is not None
        n = spark.read.parquet(out).count()
        assert rec["row_count"] == n and n > 0


class TestStatefulDedup:
    def test_cross_batch_dedup(self, spark, tmp_path):
        import os

        from gdal_spark.streaming.ingest import stream_exact_dedup

        # two files -> two micro-batches (maxFilesPerTrigger=1); the
        # duplicate text in batch 2 must be dropped by the STATE, not
        # by in-batch grouping
        p = str(tmp_path / "in")
        os.makedirs(p)
        spark.createDataFrame(
            [(0, "alpha beta"), (1, "gamma delta")], "doc_id bigint, text string"
        ).coalesce(1).write.parquet(p + "/b1")
        spark.createDataFrame(
            [(2, "alpha beta"), (3, "epsilon zeta")], "doc_id bigint, text string"
        ).coalesce(1).write.parquet(p + "/b2")
        import shutil

        flat = str(tmp_path / "flat")
        os.makedirs(flat)
        n = 0
        for sub in ("b1", "b2"):
            for f in sorted(os.listdir(p + "/" + sub)):
                if f.endswith(".parquet"):
                    shutil.copy(f"{p}/{sub}/{f}", f"{flat}/{n:02d}.parquet")
                    n += 1
        schema = spark.read.parquet(flat).schema
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(flat)
        dedup = stream_exact_dedup(stream)
        q = (
            dedup.select("doc_id", "text")
            .writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM dedup_stream").collect()
        texts = sorted(r.text for r in rows)
        assert texts == ["alpha beta", "epsilon zeta", "gamma delta"]
        kept = {r.text: r.doc_id for r in rows}
        assert kept["alpha beta"] == 0  # the FIRST batch's copy won


def test_stream_window_query_matches_batch(spark):
    """q_stream_window (watermarked 1-day tumbling windows, 3
    time-ordered micro-batches, complete mode) == plain batch agg."""
    from pyspark.sql import functions as F

    from gdal_spark.queries import load, q_stream_window
    from tests.conftest import SF_DIR

    sf = SF_DIR
    got = {(r.w_start, r.event_type): (r.n, r.sv1000)
           for r in q_stream_window(spark, sf).collect()}
    ev = load(spark, sf, "events")
    exp = {
        (r.w_start, r.event_type): (r.n, r.sv1000)
        for r in ev.groupBy(
            F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("w_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"),
             F.floor(F.sum("value") * 1000 + 0.5).cast("bigint").alias("sv1000"))
        .collect()
    }
    assert got == exp
