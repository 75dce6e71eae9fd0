"""Sliding-window chunker (text.chunk_documents) — coverage/overlap
invariants + DuckDB-twin parity."""

import duckdb
import pandas as pd
import pytest

from gdal_spark.text import chunk_documents, chunk_documents_sql


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


class TestChunkDocuments:
    def test_exact_layout(self, spark):
        out = chunk_documents(_docs(spark, ["abcdefghij"]), 4, 1).orderBy(
            "chunk_id").collect()
        # step 3: starts 0,3,6 — a start at 9 (9 >= len - overlap)
        # would emit "j", fully contained in the chunk at 6
        assert [(r.chunk_id, r.chunk_start, r.chunk_len, r.chunk_text)
                for r in out] == [
            (0, 0, 4, "abcd"), (1, 3, 4, "defg"), (2, 6, 4, "ghij"),
        ]

    def test_no_redundant_tail(self, spark):
        # len=10, size=5, overlap=2, step=3: old rule emitted a 1-char
        # chunk at 9 already covered by the chunk at 6
        out = chunk_documents(_docs(spark, ["0123456789"]), 5, 2).orderBy(
            "chunk_id").collect()
        assert [(r.chunk_start, r.chunk_text) for r in out] == [
            (0, "01234"), (3, "34567"), (6, "6789"),
        ]
        # tail shorter than overlap still gets its own (first) chunk
        out1 = chunk_documents(_docs(spark, ["a"]), 5, 2).collect()
        assert [(r.chunk_start, r.chunk_text) for r in out1] == [(0, "a")]

    def test_no_overlap(self, spark):
        out = chunk_documents(_docs(spark, ["abcdefgh"]), 4).collect()
        assert sorted(r.chunk_text for r in out) == ["abcd", "efgh"]

    def test_overlap_invariant(self, spark):
        out = chunk_documents(_docs(spark, ["x" * 100 + "y" * 55]), 16, 5) \
            .orderBy("chunk_id").collect()
        text = "x" * 100 + "y" * 55
        for r in out:
            assert r.chunk_text == text[r.chunk_start:r.chunk_start + 16]
        # consecutive chunks share exactly 5 chars
        for a, b in zip(out, out[1:]):
            assert b.chunk_start - a.chunk_start == 11
        # full coverage: union of [start, start+len) == [0, len)
        covered = set()
        for r in out:
            covered.update(range(r.chunk_start, r.chunk_start + r.chunk_len))
        assert covered == set(range(len(text)))

    def test_empty_doc_no_chunks(self, spark):
        out = chunk_documents(_docs(spark, ["", "ab"]), 4)
        assert [r.doc_id for r in out.collect()] == [1]

    def test_validation(self, spark):
        d = _docs(spark, ["ab"])
        with pytest.raises(ValueError, match="chunk_size"):
            chunk_documents(d, 0)
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(d, 4, 4)

    def test_duckdb_twin(self, spark):
        texts = ["abc def ghi jkl " * ((i % 9) + 1) for i in range(60)] + [""]
        got = chunk_documents(_docs(spark, texts), 24, 8).orderBy(
            "doc_id", "chunk_id").toPandas()
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(
            [(i, t) for i, t in enumerate(texts)], columns=["doc_id", "text"]))
        want = con.execute(
            chunk_documents_sql(24, 8) + " ORDER BY doc_id, chunk_id").df()
        assert len(got) == len(want)
        for c in got.columns:
            assert list(got[c]) == list(want[c]), c
