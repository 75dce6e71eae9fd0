"""segment_dedup (CCNet/RefinedWeb line dedup over k-token segments)
and the Bloom-bitmap membership probe: brute-force + DuckDB-twin
parity, and the no-false-negative Bloom guarantee."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from gdal_spark.dedup import (
    bloom_build_words,
    bloom_member_col,
    bloom_position_sql,
    segment_dedup,
    segment_dedup_sql,
)

# doc 0 and 1 share their first 2-token segment ("dup dup"); doc 2 is
# unique; doc 3 shares its SECOND segment with doc 4's first; doc 5 is
# shorter than one segment
DOCS = [
    (0, "dup dup alpha beta"),
    (1, "dup dup gamma delta"),
    (2, "totally unique words here"),
    (3, "lead in boiler plate"),
    (4, "boiler plate trail out"),
    (5, "tiny"),
]


class TestSegmentDedup:
    def test_matches_brute_force(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in segment_dedup(df, seg_tokens=2, min_df=2).collect()
        }
        # brute force: 2-token segments, df over distinct docs
        segs = {
            i: [" ".join(t.split()[j : j + 2]) for j in range(0, len(t.split()), 2)]
            for i, t in DOCS
        }
        from collections import Counter

        dfc = Counter()
        for i, ss in segs.items():
            for s in set(ss):
                dfc[s] += 1
        for i, ss in segs.items():
            kept = [s for s in ss if dfc[s] < 2]
            assert out[i]["clean_text"] == " ".join(kept), i
            assert out[i]["n_segs"] == len(ss)
            assert out[i]["n_dropped"] == len(ss) - len(kept)

    def test_duckdb_twin(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = (
            segment_dedup(df, seg_tokens=2, min_df=2)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
        want = (
            con.execute(segment_dedup_sql(seg_tokens=2, min_df=2))
            .fetchdf()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestBloom:
    def test_no_false_negatives_and_twin(self, spark):
        keys = spark.createDataFrame(
            [(f"key number {i}",) for i in range(50)], "s string"
        )
        words = bloom_build_words(keys, "s", m=1 << 12, k=3)
        probe = spark.createDataFrame(
            [(f"key number {i}",) for i in range(100)], "s string"
        )
        got = {
            r["s"]: r["hit"]
            for r in probe.select(
                "s", bloom_member_col(F.col("s"), words, m=1 << 12, k=3).alias("hit")
            ).collect()
        }
        # inserted keys MUST hit (no false negatives)
        for i in range(50):
            assert got[f"key number {i}"], i
        # the oracle's position-set membership is EXACTLY the bitmap:
        # replay in DuckDB and compare every verdict (incl. any false
        # positives among keys 50..99)
        con = duckdb.connect()
        con.register("probe", pd.DataFrame({"s": [f"key number {i}" for i in range(100)]}))
        con.register("ev", pd.DataFrame({"s": [f"key number {i}" for i in range(50)]}))
        pos = [bloom_position_sql("s", i, m=1 << 12) for i in range(3)]
        member = " AND ".join(f"({p}) IN (SELECT p FROM ep)" for p in pos)
        want = dict(
            con.execute(
                f"WITH ep AS (SELECT DISTINCT unnest([{', '.join(pos)}]) AS p FROM ev) "
                f"SELECT s, {member} FROM probe"
            ).fetchall()
        )
        assert got == want

    def test_bitmap_word_signs(self, spark):
        # force a key whose bit lands in the sign region (bit 63 of
        # some word) by brute-forcing keys until one does, then check
        # the signed round-trip still tests TRUE
        m, k = 1 << 8, 1  # tiny bitmap, every word exercised fast
        from gdal_spark.dedup import bloom_positions

        probe = spark.createDataFrame([(f"x{i}",) for i in range(64)], "s string")
        pos = probe.select(bloom_positions(F.col("s"), m, k)[0].alias("p")).collect()
        target = next(
            (i for i, r in enumerate(pos) if int(r["p"]) % 64 == 63), None
        )
        if target is None:
            return  # statistically ~63/64 chance one exists; skip otherwise
        key = f"x{target}"
        words = bloom_build_words(
            spark.createDataFrame([(key,)], "s string"), "s", m=m, k=k
        )
        assert any(w < 0 for w in words)  # bit 63 set -> negative long
        row = (
            spark.createDataFrame([(key,)], "s string")
            .select(bloom_member_col(F.col("s"), words, m=m, k=k).alias("hit"))
            .first()
        )
        assert row["hit"]
