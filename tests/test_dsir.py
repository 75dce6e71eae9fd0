"""DSIR importance weights (text.dsir_importance_weights) — scoring
direction, determinism, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gdal_spark.text import dsir_importance_weights, dsir_importance_weights_sql


def _docs(spark):
    rows = []
    for i in range(40):
        if i % 2 == 0:
            text = f"the quick brown fox jumps over the lazy dog {i}"
            lang = "en"
        else:
            text = f"der schnelle braune fuchs springt ueber den hund {i}"
            lang = "de"
        rows.append((i, text, lang))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestDsir:
    def test_target_docs_score_higher(self, spark):
        d = _docs(spark)
        out = {r.doc_id: r.weight for r in
               dsir_importance_weights(d, F.col("lang") == "en").collect()}
        en = [out[i] for i in range(0, 40, 2)]
        de = [out[i] for i in range(1, 40, 2)]
        # target-distribution documents must outscore the others: their
        # tokens dominate the target counts of their buckets
        assert min(en) > max(de)

    def test_deterministic(self, spark):
        d = _docs(spark)
        a = sorted((r.doc_id, r.n_tokens, r.weight) for r in
                   dsir_importance_weights(d, F.col("lang") == "en").collect())
        b = sorted((r.doc_id, r.n_tokens, r.weight) for r in
                   dsir_importance_weights(d, F.col("lang") == "en").collect())
        assert a == b

    def test_duckdb_twin(self, spark):
        d = _docs(spark)
        got = sorted((r.doc_id, r.n_tokens, r.weight) for r in
                     dsir_importance_weights(d, F.col("lang") == "en").collect())
        con = duckdb.connect()
        con.register("documents", d.toPandas())
        want = sorted(tuple(r) for r in con.execute(
            dsir_importance_weights_sql("lang = 'en'")).fetchall())
        assert got == want

    def test_empty_and_null_text_excluded(self, spark):
        d = spark.createDataFrame(
            [(0, "hello world", "en"), (1, "", "en"), (2, None, "en")],
            "doc_id long, text string, lang string")
        out = dsir_importance_weights(d, F.col("lang") == "en").collect()
        assert [r.doc_id for r in out] == [0]
        assert out[0].n_tokens == 2
