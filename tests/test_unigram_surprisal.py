"""CCNet-shaped unigram LM surprisal filter (text.unigram_surprisal):
closed-form checks + DuckDB-twin parity + OOV/vocab-cap rules."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from gdal_spark.text import unigram_surprisal, unigram_surprisal_sql


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


class TestUnigramSurprisal:
    def test_closed_form(self, spark):
        # corpus: "a a a b" -> N=4 (bitlen 3), c(a)=3 (c+1=4, bitlen 3),
        # c(b)=1 (c+1=2, bitlen 2)
        out = {r.doc_id: r for r in unigram_surprisal(
            _docs(spark, ["a a a", "b"])).collect()}
        assert out[0].n_tokens == 3 and out[0].n_oov == 0
        assert out[0].surprisal_bits == 3 * (3 - 3)  # frequent word: 0 bits
        assert out[1].surprisal_bits == 3 - 2        # rare word: 1 bit

    def test_vocab_cap_and_oov(self, spark):
        # vocab_size=1 keeps only the most frequent word; ties broken
        # (count desc, word asc). "b" falls out -> OOV, c=0 -> bitlen 1.
        out = {r.doc_id: r for r in unigram_surprisal(
            _docs(spark, ["a a a", "b"]), vocab_size=1).collect()}
        assert out[1].n_oov == 1
        assert out[1].surprisal_bits == 3 - 1  # bitlen(N)=3, bitlen(0+1)=1

    def test_rarer_scores_higher(self, spark):
        corpus = ["the the the the the the the the", "qux"]
        out = {r.doc_id: r for r in unigram_surprisal(_docs(spark, corpus)).collect()}
        mean0 = out[0].surprisal_bits / out[0].n_tokens
        mean1 = out[1].surprisal_bits / out[1].n_tokens
        assert mean1 > mean0

    def test_duckdb_twin(self, spark):
        texts = [
            " ".join(f"w{(i * j) % 13}" for j in range((i % 17) + 1))
            for i in range(120)
        ]
        df = _docs(spark, texts)
        got = (
            unigram_surprisal(df, vocab_size=7)
            .orderBy("doc_id").toPandas()
        )
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(
            [(i, t) for i, t in enumerate(texts)], columns=["doc_id", "text"]))
        want = con.execute(
            unigram_surprisal_sql(vocab_size=7) + " ORDER BY doc_id"
        ).df()
        for c in ("doc_id", "n_tokens", "n_oov", "surprisal_bits"):
            assert list(got[c].astype("int64")) == list(want[c].astype("int64")), c

    def test_plan_broadcasts_vocab(self, spark):
        df = _docs(spark, ["a b c", "a a"])
        plan = unigram_surprisal(df)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
