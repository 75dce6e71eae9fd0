"""`gdal vector partition` flat scheme (gdalalg_vector_partition.cpp:
35 DEFAULT_PATTERN_FLAT, :461-469 FIELD_VALUE composition, :477-505
counter slot): one directory, pattern-named files, partitioned fields
kept in the data by default."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from gdal_spark.relational import partition_write


def _df(spark):
    return (
        spark.range(30)
        .withColumn("grp", F.when(F.col("id") % 3 == 0, "a")
                    .when(F.col("id") % 3 == 1, "b"))  # id%3==2 -> NULL
        .repartition("grp")
    )


class TestFlatScheme:
    def test_flat_names_and_fields_kept(self, spark, tmp_path):
        out = str(tmp_path / "flat")
        rec = partition_write(_df(spark), out, ["grp"], scheme="flat",
                              layer_name="docs")
        names = sorted(f["file"] for f in rec["files"])
        assert names == [
            "docs___NULL___0000000001.parquet",
            "docs_a_0000000001.parquet",
            "docs_b_0000000001.parquet",
        ]
        listing = sorted(os.listdir(out))
        assert [n for n in listing if n.endswith(".parquet")] == names
        assert not any(d.startswith("grp=") or d.startswith("_pk_")
                       for d in listing)
        # flat default KEEPS the partitioned field in the data files
        t = pq.read_table(os.path.join(out, "docs_a_0000000001.parquet"))
        assert "grp" in t.column_names
        assert "_pk_grp" not in t.column_names
        assert set(t.column("grp").to_pylist()) == {"a"}
        assert t.num_rows == 10

    def test_flat_omit_partitioned_fields(self, spark, tmp_path):
        out = str(tmp_path / "flat2")
        partition_write(_df(spark), out, ["grp"], scheme="flat",
                        layer_name="docs", omit_partitioned_fields=True)
        t = pq.read_table(os.path.join(out, "docs_b_0000000001.parquet"))
        assert "grp" not in t.column_names

    def test_flat_no_partition_fields(self, spark, tmp_path):
        out = str(tmp_path / "flat3")
        rec = partition_write(
            spark.range(7).coalesce(1), out, [], scheme="flat",
            layer_name="L",
        )
        assert [f["file"] for f in rec["files"]] == ["L_0000000001.parquet"]

    def test_custom_pattern_width(self, spark, tmp_path):
        out = str(tmp_path / "flat4")
        rec = partition_write(
            _df(spark).filter(F.col("grp") == "a"), out, ["grp"],
            scheme="flat", pattern="{LAYER_NAME}-{FIELD_VALUE}.%03d",
            layer_name="x",
        )
        assert [f["file"] for f in rec["files"]] == ["x-a.001.parquet"]

    def test_bad_pattern_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError):
            partition_write(_df(spark), str(tmp_path / "f5"), ["grp"],
                            scheme="flat", pattern="nope")

    def test_readback_roundtrip(self, spark, tmp_path):
        out = str(tmp_path / "flat6")
        partition_write(_df(spark), out, ["grp"], scheme="flat")
        back = spark.read.parquet(out)
        assert back.count() == 30
        assert back.filter(F.col("grp").isNull()).count() == 10

    def test_percent_in_field_value_not_counter_slot(self, spark, tmp_path):
        """A field value containing '%' (hive-escapes to %25) must not
        be mistaken for the counter slot — the reference splits the
        pattern at %d BEFORE substituting (:474-485)."""
        df = spark.range(4).withColumn(
            "grp", F.when(F.col("id") % 2 == 0, "x%d").otherwise("y")
        ).repartition("grp")
        out = str(tmp_path / "flat7")
        rec = partition_write(df, out, ["grp"], scheme="flat",
                              layer_name="L", pattern="{LAYER_NAME}_{FIELD_VALUE}_%03d")
        names = sorted(f["file"] for f in rec["files"])
        assert names == ["L_x%25d_001.parquet", "L_y_001.parquet"]

    def test_colliding_field_values_do_not_overwrite(self, spark, tmp_path):
        """'_' is not hive-escaped, so distinct key tuples can join to
        the same FIELD_VALUE — the counter must be per name stem, not
        per key, or the second rename silently replaces the first."""
        df = spark.createDataFrame(
            [(1, "x_y", "z"), (2, "x_y", "z"), (3, "x", "y_z")],
            "id long, a string, b string",
        ).repartition("a", "b")
        out = str(tmp_path / "flat8")
        rec = partition_write(df, out, ["a", "b"], scheme="flat", layer_name="L")
        names = sorted(f["file"] for f in rec["files"])
        assert names == ["L_x_y_z_0000000001.parquet", "L_x_y_z_0000000002.parquet"]
        back = spark.read.parquet(out)
        assert back.count() == 3  # nothing lost

    def test_multiple_counter_slots_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError):
            partition_write(_df(spark), str(tmp_path / "f9"), ["grp"],
                            scheme="flat", pattern="L_%03d_%d")

    def test_lineage_sidecar_rewritten(self, spark, tmp_path):
        import json
        import os

        out = str(tmp_path / "flat10")
        rec = partition_write(_df(spark), out, ["grp"], scheme="flat",
                              layer_name="docs")
        with open(os.path.join(out, "_lineage.json")) as fh:
            side = json.load(fh)
        files = sorted(f["file"] for f in side["files"])
        assert files == sorted(f["file"] for f in rec["files"])
        for f in files:
            assert os.path.exists(os.path.join(out, f))
