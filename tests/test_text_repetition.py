"""repetition_signals (Gopher repetition filters) vs a direct Python
reference implementation and the DuckDB oracle twin."""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from gdal_spark.text import repetition_signals, repetition_signals_sql

DOCS = [
    (0, "the cat sat on the mat the cat"),
    (1, "word"),
    (2, "a a a a a a"),
    (3, "x y x y x y x y z"),
    (4, "all distinct words here truly"),
    (5, "ab ab  ab   ab"),  # multi-space separators
    (6, "one two three two three two"),
]


def ref_signals(text: str) -> tuple[int, int, int, int]:
    ws = re.split(r"\s+", text.strip())
    n = len(ws)
    nd = len(set(ws))
    topw = max(ws.count(w) for w in set(ws))
    gs = [ws[i] + " " + ws[i + 1] for i in range(n - 1)]
    cover = max((gs.count(g) * len(g) for g in set(gs)), default=None)
    c1000 = 0 if cover is None else math.floor(cover * 1000 / len(text))
    return n, math.floor((n - nd) * 1000 / n), topw, c1000


class TestRepetitionSignals:
    def test_matches_python_reference(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["n_words"],
                r["dup_word_frac_x1000"],
                r["top_word_count"],
                r["top2_cover_x1000"],
            )
            for r in repetition_signals(df).collect()
        }
        for doc_id, text in DOCS:
            assert got[doc_id] == ref_signals(text), (doc_id, text)

    def test_oracle_twin_identical(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = sorted(tuple(r) for r in repetition_signals(df).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
        want = sorted(tuple(r) for r in con.execute(repetition_signals_sql("doc_id", "text")).fetchall())
        assert got == want

    def test_known_values(self, spark):
        # "a a a a a a": 6 words, 1 distinct -> dup (6-1)*1000/6 = 833;
        # top word 6; grams "a a" x5, len 3, text len 11 -> 5*3*1000/11 = 1363
        df = spark.createDataFrame([DOCS[2]], "doc_id long, text string")
        r = repetition_signals(df).collect()[0]
        assert (r["n_words"], r["dup_word_frac_x1000"]) == (6, 833)
        assert (r["top_word_count"], r["top2_cover_x1000"]) == (6, 1363)

    def test_plan_is_pure_catalyst(self, spark):
        """No Python evaluation nodes: the signals are whole-stage
        Catalyst array expressions (the 100-TB contract)."""
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        plan = repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan  # no BatchEvalPython / ArrowEvalPython
