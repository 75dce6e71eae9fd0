"""Sequence packing (GPT-style concat-and-chunk pretraining batcher,
text.pack_sequences) — invariants + DuckDB-twin parity."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.text import pack_sequences, pack_sequences_sql


def _docs(spark, weights):
    rows = [(i, w) for i, w in enumerate(weights)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


class TestPackSequences:
    def test_basic_layout(self, spark):
        # tokens: 3, 5, 4 with seq_len 4 -> stream of 12 = 3 windows
        out = pack_sequences(_docs(spark, [3, 5, 4]), 4,
                             weight_col="n_tokens").orderBy(
            "window_id", "doc_id").collect()
        got = [(r.window_id, r.doc_id, r.slice_start, r.slice_end, r.win_off)
               for r in out]
        assert got == [
            (0, 0, 0, 3, 0),   # doc0 fully in window 0
            (0, 1, 0, 1, 3),   # doc1's first token completes window 0
            (1, 1, 1, 5, 0),   # doc1's remaining 4 fill window 1
            (2, 2, 0, 4, 0),   # doc2 fills window 2
        ]

    def test_every_window_full(self, spark):
        weights = [7, 1, 13, 2, 2, 9, 31, 4, 4, 4, 1, 1, 1, 5]
        out = pack_sequences(_docs(spark, weights), 8, weight_col="n_tokens")
        fills = {
            r.window_id: r.f
            for r in out.groupBy("window_id")
            .agg(F.sum(F.col("slice_end") - F.col("slice_start")).alias("f"))
            .collect()
        }
        total = sum(weights)
        nwin = -(-total // 8)
        assert sorted(fills) == list(range(nwin))
        for wid, f in fills.items():
            assert f == (8 if wid < nwin - 1 else total - 8 * (nwin - 1))

    def test_slices_partition_each_doc(self, spark):
        weights = [10, 1, 25, 3]
        out = pack_sequences(_docs(spark, weights), 8, weight_col="n_tokens")
        per_doc = (
            out.groupBy("doc_id")
            .agg(F.sum(F.col("slice_end") - F.col("slice_start")).alias("n"),
                 F.min("slice_start").alias("lo"), F.max("slice_end").alias("hi"))
            .collect()
        )
        for r in per_doc:
            assert r.n == weights[r.doc_id]
            assert r.lo == 0 and r.hi == weights[r.doc_id]

    def test_zero_token_docs_dropped(self, spark):
        out = pack_sequences(_docs(spark, [4, 0, 4]), 4, weight_col="n_tokens")
        assert sorted(r.doc_id for r in out.select("doc_id").distinct().collect()) == [0, 2]

    def test_empty_input(self, spark):
        out = pack_sequences(_docs(spark, []), 4, weight_col="n_tokens")
        assert out.count() == 0

    def test_seq_len_validation(self, spark):
        with pytest.raises(ValueError, match="seq_len"):
            pack_sequences(_docs(spark, [1]), 0, weight_col="n_tokens")

    def test_duckdb_twin_on_text(self, spark):
        rows = [(i, " ".join(f"w{j}" for j in range((i * 7) % 23 + 1)))
                for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = (
            pack_sequences(df, 16)
            .orderBy("window_id", "doc_id")
            .toPandas()
        )
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
        want = con.execute(
            pack_sequences_sql(16) + " ORDER BY window_id, doc_id"
        ).df()
        for c in got.columns:
            assert list(got[c].astype("int64")) == list(want[c].astype("int64")), c
