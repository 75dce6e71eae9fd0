"""substring_dup_spans (Lee et al. 2022 ExactSubstr) vs a brute-force
Python reference and the DuckDB oracle twin."""

from __future__ import annotations

import duckdb

from gdal_spark.dedup import substring_dup_spans, substring_dup_spans_sql

# crafted corpus: a shared 12-char phrase across docs 0/1, an internal
# repeat inside doc 2, a unique doc 3, and a doc shorter than L
DOCS = [
    (0, "AAAA the quick brown fox BBBB zzzz qqqq"),
    (1, "CCCC the quick brown fox DDDD yyyy wwww"),
    (2, "repeat me now repeat me now tail unique"),
    (3, "totally unique text with no duplication"),
    (4, "short"),
]
L = 12


def ref_spans(docs: list[tuple[int, str]], min_len: int) -> set[tuple[int, int, int]]:
    """Brute force: every duplicated window offset, merged into runs."""
    from collections import defaultdict

    occ: defaultdict[str, list[tuple[int, int]]] = defaultdict(list)
    for i, t in docs:
        for o in range(1, len(t) - min_len + 2):
            occ[t[o - 1 : o - 1 + min_len]].append((i, o))
    dup = defaultdict(list)
    for _w, positions in occ.items():
        if len(positions) >= 2:
            for i, o in positions:
                dup[i].append(o)
    spans = set()
    for i, offs in dup.items():
        offs = sorted(set(offs))
        start = prev = offs[0]
        for o in offs[1:]:
            if o == prev + 1:
                prev = o
                continue
            spans.add((i, start, prev + min_len - 1))
            start = prev = o
        spans.add((i, start, prev + min_len - 1))
    return spans


class TestSubstringDupSpans:
    def test_matches_bruteforce(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in substring_dup_spans(df, min_len=L).collect()
        }
        assert got == ref_spans(DOCS, L)
        # the shared phrase must be flagged in both docs 0 and 1
        assert any(i == 0 for i, _, _ in got) and any(i == 1 for i, _, _ in got)
        # self-repetition inside doc 2 is also a duplication (paper rule)
        assert any(i == 2 for i, _, _ in got)
        # unique and too-short docs produce nothing
        assert not any(i in (3, 4) for i, _, _ in got)

    def test_oracle_twin_identical(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = sorted(tuple(r) for r in substring_dup_spans(df, min_len=L).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
        want = sorted(
            tuple(r) for r in con.execute(substring_dup_spans_sql("doc_id", "text", min_len=L)).fetchall()
        )
        assert got == want

    def test_plan_is_pure_catalyst_shuffles(self, spark):
        """No Python nodes; the only wide stages are the groupBy(hash)
        count, the hash re-join, and the islands window."""
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        plan = substring_dup_spans(df, min_len=L)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
