"""C4/FineWeb-style line-level quality signals
(text.line_quality_signals) — rule checks + DuckDB-twin parity."""

import duckdb
import pandas as pd

from gdal_spark.text import line_quality_signals, line_quality_signals_sql


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


class TestLineQuality:
    def test_rules(self, spark):
        doc = (
            "A real sentence here.\n"
            "- a bullet item\n"
            "* another bullet\n"
            "trailing thought...\n"
            'quoted line"\n'
            "tiny\n"
            "this one has no terminal punctuation at all"
        )
        r = line_quality_signals(_docs(spark, [doc])).collect()[0]
        assert r.n_lines == 7
        assert r.n_end_punct == 3  # '.', '...' counts (ends '.'), '"'
        assert r.n_bullet == 2
        assert r.n_ellipsis == 1
        # "trailing thought..." (2 words), 'quoted line"' (2), "tiny" (1)
        assert r.n_short == 3
        assert r.has_lorem == 0 and r.has_brace == 0

    def test_lorem_and_brace(self, spark):
        r = line_quality_signals(
            _docs(spark, ["Some Lorem Ipsum filler { code }"])).collect()[0]
        assert r.has_lorem == 1 and r.has_brace == 1

    def test_whitespace_trim(self, spark):
        # rules apply to TRIMMED lines
        r = line_quality_signals(
            _docs(spark, ["  - indented bullet   \n  ends well.   "])).collect()[0]
        assert r.n_bullet == 1 and r.n_end_punct == 1

    def test_duckdb_twin(self, spark):
        texts = [
            "Sentence one. ok\n- b\nshort...\nx { y",
            "no lines at all",
            "LOREM IPSUM dolor.\n\n\n* bullet here now",
            '"quote"\n   spaced   out   line here\nok!',
        ]
        got = (
            line_quality_signals(_docs(spark, texts))
            .orderBy("doc_id").toPandas()
        )
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(
            [(i, t) for i, t in enumerate(texts)], columns=["doc_id", "text"]))
        want = con.execute(
            line_quality_signals_sql() + " ORDER BY doc_id").df()
        for c in got.columns:
            assert list(got[c].astype("int64")) == list(want[c].astype("int64")), c
