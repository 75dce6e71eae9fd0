"""Deterministic seeded global shuffle (text.global_shuffle): a total
pseudo-random permutation computed without a single-partition window."""

from __future__ import annotations

import pandas as pd

from gdal_spark.text import _SHUF_A, _SHUF_P, global_shuffle


def _mix(x: int, seed: int) -> int:
    h = ((x % _SHUF_P + _SHUF_P) % _SHUF_P + seed % _SHUF_P) % _SHUF_P
    h = h * _SHUF_A % _SHUF_P
    return h * _SHUF_A % _SHUF_P


def test_permutation_and_brute_force_parity(spark):
    ids = list(range(0, 500, 3)) + [10**12 + 7, -5]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    out = {r.doc_id: r.shuffle_seq for r in global_shuffle(df, seed=42).collect()}
    assert sorted(out.values()) == list(range(len(ids)))
    expect = {i: rank for rank, i in enumerate(sorted(ids, key=lambda i: (_mix(i, 42), i)))}
    assert out == expect


def test_seed_changes_order_and_determinism(spark):
    ids = list(range(200))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    a = {r.doc_id: r.shuffle_seq for r in global_shuffle(df, seed=1).collect()}
    a2 = {r.doc_id: r.shuffle_seq for r in global_shuffle(df, seed=1).collect()}
    b = {r.doc_id: r.shuffle_seq for r in global_shuffle(df, seed=2).collect()}
    assert a == a2  # same seed -> identical permutation
    assert a != b  # different seed -> different permutation
    assert a != {i: i for i in ids}  # actually shuffled


def test_many_buckets_still_dense(spark):
    ids = list(range(1000))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    out = global_shuffle(df, seed=7, nbuckets=64)
    seqs = [r.shuffle_seq for r in out.collect()]
    assert sorted(seqs) == list(range(1000))
