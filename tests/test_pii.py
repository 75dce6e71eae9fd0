"""PII scrubbing (email/IP/phone regex redaction with typed tokens)
and the BPE-ish pretokenizer count — the dialect-shared-regex rule:
every pattern must behave bit-identically under Java regex (Spark)
and RE2 (DuckDB oracles)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from gdal_spark.text import (
    BPE_PRETOKEN_PATTERN,
    PII_PATTERNS,
    bpe_token_count,
    bpe_token_count_sql,
    pii_counts,
    pii_counts_sql,
    pii_redact,
    pii_redact_sql,
)

SAMPLES = [
    "write to user42@example.com or 10.0.255.3 now",
    "call 555-867-5309, backup 555 123 4567; bad-octet ip 999.999.1.1",
    "unicode: héllo wörld 3.14 can't stop won't",
    "",
    None,
    "a@b.c x@y-z.co.uk 1.2.3.4.5",
    "tab\tsep  double  spaces\nnewline 'quote'",
    "v4-ish 1.2.3.4567 is no phone; 123-456-7890 is",
    # dialect-divergence triggers: Java's \b is Unicode-aware, RE2's is
    # ASCII — boundary-free patterns must agree on all of these
    "é1.2.3.4 and 宽1.2.3.4",
    "é123-456-7890 phone after a letter",
    # Java \s includes vertical tab, RE2's does not — the explicit
    # whitespace class must agree
    "a\x0b b\x0bc",
]


def _spark_rows(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    c = pii_counts(F.col("t"))
    return df.select(
        *(v.alias(k) for k, v in c.items()),
        bpe_token_count(F.col("t")).alias("bpe"),
        pii_redact(F.col("t")).alias("red"),
    ).collect()


def _duck_rows(texts):
    con = duckdb.connect()
    con.execute("CREATE TABLE s(t VARCHAR)")
    for t in texts:
        con.execute("INSERT INTO s VALUES (?)", [t])
    c = pii_counts_sql("t")
    q = (
        f"SELECT {c['email']}, {c['ip']}, {c['phone']}, "
        f"{bpe_token_count_sql('t')}, {pii_redact_sql('t')} FROM s"
    )
    return con.execute(q).fetchall()


class TestPinnedValues:
    def test_redaction_tokens(self, spark):
        rows = _spark_rows(spark, [SAMPLES[0]])
        assert rows[0]["red"] == "write to |||EMAIL||| or |||IP_ADDRESS||| now"
        assert (rows[0]["email"], rows[0]["ip"], rows[0]["phone"]) == (1, 1, 0)

    def test_phone_variants_and_loose_ip(self, spark):
        r = _spark_rows(spark, [SAMPLES[1]])[0]
        # space- and dash-separated both match; 999.999.1.1 matches the
        # documented LOOSE IPv4 rule (no octet range check, Dolma-style)
        assert (r["email"], r["ip"], r["phone"]) == (0, 1, 2)

    def test_email_redacts_before_phone_can_half_match(self, spark):
        r = _spark_rows(spark, ["x 555-123-4567@host.org y"])[0]
        # counts are per-pattern over the RAW text (the phone digits do
        # match there), but redaction is sequential with email first, so
        # no phone token ever appears in the output
        assert (r["email"], r["phone"]) == (1, 1)
        assert r["red"] == "x |||EMAIL||| y"

    def test_null_and_empty(self, spark):
        rows = _spark_rows(spark, ["", None])
        for r in rows:
            assert (r["email"], r["ip"], r["phone"], r["bpe"]) == (0, 0, 0, 0)
            assert r["red"] == ""

    def test_pretokenizer_contractions_and_unicode(self, spark):
        r = _spark_rows(spark, ["can't stop héllo 3.14"])[0]
        # can|'t| stop| héllo| 3|.|14  -> 7 pretokens
        assert r["bpe"] == 7


class TestCrossEngine:
    def test_bit_identical_vs_duckdb(self, spark):
        srows = _spark_rows(spark, SAMPLES)
        drows = _duck_rows(SAMPLES)
        for s, d in zip(srows, drows):
            assert (s["email"], s["ip"], s["phone"], s["bpe"], s["red"]) == tuple(d)

    def test_patterns_stay_in_shared_dialect(self):
        # no lookaround, no backrefs — the constructs RE2 lacks — and
        # no \b or bare \s, whose semantics DIFFER between Java and
        # RE2 (Unicode vs ASCII word chars; VT in \s)
        for _, pat, _ in PII_PATTERNS + [("bpe", BPE_PRETOKEN_PATTERN, "")]:
            assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat
            assert "\\1" not in pat
            assert "\\b" not in pat and "\\s" not in pat

    def test_substring_match_is_the_documented_deviation(self, spark):
        # boundary-free: a PII-shaped substring inside a longer run
        # matches (over-redaction) — identically on both engines
        texts = ["1.2.3.4567", "x4123-456-7890"]
        s = _spark_rows(spark, texts)
        d = _duck_rows(texts)
        assert (s[0]["ip"], s[1]["phone"]) == (1, 1)
        for srow, drow in zip(s, d):
            assert (srow["email"], srow["ip"], srow["phone"], srow["bpe"],
                    srow["red"]) == tuple(drow)
