"""Span-sequence integrity (BASELINE.json input_hint: "per-row
invariant vs the reference: span-sequence equality (kind, text,
media_ref, order)").

Spark's array<struct> columns preserve element order through every
shuffle natively, so the invariant holds by construction as long as
operators treat `spans` as an opaque column (they do — no operator
explodes it destructively). These helpers make the invariant
AUDITABLE: a fingerprint column computed before a pipeline and
re-checked after it proves order survived, row by row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def span_fingerprint(spans_col: str = "spans") -> Column:
    """Order-sensitive fingerprint of the span sequence: md5 over the
    concatenated (kind, text, media_ref, offset) tuples IN ORDER.
    Any reordering, drop, or mutation changes it."""
    tup = F.transform(
        F.col(spans_col),
        lambda s: F.concat_ws(
            "\x1f", s["kind"], s["text"], s["media_ref"], s["offset"].cast("string")
        ),
    )
    return F.md5(F.concat_ws("\x1e", tup).cast("binary"))


def offsets_are_sequential(spans_col: str = "spans") -> Column:
    """True iff offsets are exactly 0..len-1 in element order (the F1
    generation invariant)."""
    idx_ok = F.transform(F.col(spans_col), lambda s: s["offset"].cast("int"))
    expected = F.sequence(F.lit(0), F.size(spans_col) - 1)
    return (F.size(spans_col) == 0) | (idx_ok == expected)


def audit_span_integrity(
    before: DataFrame, after: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> int:
    """Join before/after on id and count rows whose span fingerprint
    changed (0 == invariant held). The join is on fingerprints only —
    two tiny columns per side, never the spans themselves."""
    b = before.select(F.col(id_col).alias("_k"), span_fingerprint(spans_col).alias("_fb"))
    a = after.select(F.col(id_col).alias("_k"), span_fingerprint(spans_col).alias("_fa"))
    return (
        b.join(a, "_k", "inner").filter(F.col("_fb") != F.col("_fa")).count()
        + b.join(a, "_k", "left_anti").count()
    )
