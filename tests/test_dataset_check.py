"""gdal dataset check: distributed full-read integrity verification.

Reference: apps/gdalalg_dataset_check.cpp:288-530 — every pixel
window / vector feature / mdim chunk is actually read; any failure
returns ret code 1.  The distributed form additionally cross-checks
decoded row counts against the _lineage.json sidecar.
"""

import io
import os
import zipfile

import pytest

from gdal_spark.metrics import write_snapshot
from gdal_spark.operators.fsops import check_summary, dataset_check


def _write_vec(spark, path, n=50):
    df = spark.range(n).selectExpr("id", "cast(id * 2 as double) AS v")
    write_snapshot(df.repartition(3), str(path), job_id="t")
    return df


def _parts(path):
    return sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )


class TestCheckOk:
    def test_vector_snapshot_green(self, spark, tmp_path):
        _write_vec(spark, tmp_path / "ds")
        rep = dataset_check(spark, str(tmp_path / "ds"))
        rows = {r.relpath: r for r in rep.collect()}
        parts = [r for r in rows.values() if r.driver == "Parquet"]
        assert all(r.ok for r in rows.values())
        assert sum(r.n_rows for r in parts) == 50
        s = check_summary(rep).first()
        assert s.ret_code == 0
        assert s.n_features == 50
        assert s.total_content == 50 * 100  # RATIO_FEATURE_TO_PIXEL

    def test_tile_table_counts_pixels(self, spark, tmp_path):
        import numpy as np

        from gdal_spark.operators.raster import TILE_SCHEMA

        rows = []
        for band in (1, 2):
            for ty, tx, h, w in [(0, 0, 32, 32), (0, 1, 32, 32), (1, 0, 16, 32)]:
                pay = (np.arange(h * w, dtype=np.uint8) + band).tobytes()
                rows.append((band, ty, tx, h, w, "uint8", pay))
        tiles = spark.createDataFrame(rows, TILE_SCHEMA)
        write_snapshot(tiles, str(tmp_path / "ras"), job_id="t")
        rep = dataset_check(spark, str(tmp_path / "ras"))
        assert all(r.ok for r in rep.collect())
        s = check_summary(rep).first()
        assert s.n_pixels == 2 * (32 * 32 + 32 * 32 + 16 * 32)
        assert s.ret_code == 0
        # tile rows count as pixels, not features
        assert s.n_features == 0
        assert s.total_content == s.n_pixels

    def test_single_file_target(self, spark, tmp_path):
        _write_vec(spark, tmp_path / "ds")
        part = _parts(tmp_path / "ds")[0]
        rep = dataset_check(spark, part).collect()
        assert len(rep) == 1 and rep[0].ok and rep[0].relpath == "."


class TestCheckFailures:
    def test_truncated_part_flags(self, spark, tmp_path):
        _write_vec(spark, tmp_path / "ds")
        part = _parts(tmp_path / "ds")[0]
        data = open(part, "rb").read()
        with open(part, "wb") as f:
            f.write(data[: len(data) // 2])
        rep = dataset_check(spark, str(tmp_path / "ds"))
        bad = [r for r in rep.collect() if not r.ok]
        assert len(bad) == 1 and os.path.basename(part) in bad[0].relpath
        assert check_summary(rep).first().ret_code == 1

    def test_row_count_drift_vs_lineage_flags(self, spark, tmp_path):
        """A part that still PARSES but lost rows must flag — this is
        the sidecar cross-check the reference cannot do."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        _write_vec(spark, tmp_path / "ds")
        part = _parts(tmp_path / "ds")[0]
        t = pq.read_table(part)
        if t.num_rows == 0:
            pytest.skip("empty part drawn")
        pq.write_table(t.slice(0, t.num_rows - 1), part)
        rep = dataset_check(spark, str(tmp_path / "ds"))
        bad = [r for r in rep.collect() if not r.ok]
        assert len(bad) == 1 and "lineage records" in bad[0].error

    def test_recorded_part_with_non_parquet_header_flags(self, spark, tmp_path):
        """A lineage-recorded part whose magic no longer reads PAR1
        falls to the byte-scan branch — the row-count cross-check must
        still fire there, not just in the parquet branch."""
        _write_vec(spark, tmp_path / "ds")
        part = _parts(tmp_path / "ds")[0]
        data = bytearray(open(part, "rb").read())
        data[:4] = b"\x00\x00\x00\x00"
        with open(part, "wb") as f:
            f.write(bytes(data))
        rep = dataset_check(spark, str(tmp_path / "ds"))
        bad = [r for r in rep.collect() if not r.ok]
        assert len(bad) == 1 and "lineage records" in bad[0].error
        s = check_summary(rep).first()
        assert s.ret_code == 1
        # failed files contribute nothing to the content sums
        ok_rows = sum(r.n_rows for r in rep.collect() if r.ok and r.driver == "Parquet")
        assert s.n_features == ok_rows < 50

    def test_missing_recorded_part_flags(self, spark, tmp_path):
        _write_vec(spark, tmp_path / "ds")
        part = _parts(tmp_path / "ds")[0]
        os.remove(part)
        rep = dataset_check(spark, str(tmp_path / "ds"))
        bad = {r.relpath: r.error for r in rep.collect() if not r.ok}
        assert bad == {os.path.basename(part): "recorded in lineage but absent"}

    def test_bad_tile_payload_flags(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "band": pa.array([1], pa.int32()),
                "ty": pa.array([0], pa.int32()),
                "tx": pa.array([0], pa.int32()),
                "h": pa.array([4], pa.int32()),
                "w": pa.array([4], pa.int32()),
                "dtype": ["uint16"],
                "payload": pa.array([b"\x00" * 31], pa.binary()),  # want 32
            }
        )
        os.makedirs(tmp_path / "ras")
        pq.write_table(t, tmp_path / "ras" / "part-0.parquet")
        rep = dataset_check(spark, str(tmp_path / "ras")).collect()
        assert not rep[0].ok and "expected 32" in rep[0].error

    def test_zip_crc_flags(self, spark, tmp_path):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("member.txt", "payload " * 100)
        raw = bytearray(buf.getvalue())
        raw[40] ^= 0xFF  # flip a byte inside the deflate stream
        os.makedirs(tmp_path / "ds")
        with open(tmp_path / "ds" / "a.zip", "wb") as f:
            f.write(bytes(raw))
        rep = dataset_check(spark, str(tmp_path / "ds")).collect()
        zr = [r for r in rep if r.relpath == "a.zip"][0]
        assert not zr.ok

    def test_missing_target_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            dataset_check(spark, str(tmp_path / "nope"))
