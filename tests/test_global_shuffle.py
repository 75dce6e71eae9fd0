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


def test_weighted_interleave_proportions(spark):
    from gdal_spark.text import weighted_interleave

    a = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(0, 1400, 2))}))
    b = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(1, 601, 2))}))
    out = weighted_interleave([a, b], [0.7, 0.3], seed=3)
    rows = sorted(out.collect(), key=lambda r: r.interleave_seq)
    seqs = [r.interleave_seq for r in rows]
    assert seqs == list(range(1000))
    # mixture property: any early prefix holds ~w_i proportion of each
    # source (source 0's k-th doc at (k+1)/0.7, source 1's at (k+1)/0.3)
    prefix = [r.source_id for r in rows[:200]]
    share0 = prefix.count(0) / 200
    assert 0.65 <= share0 <= 0.75
    # determinism
    again = sorted(weighted_interleave([a, b], [0.7, 0.3], seed=3).collect(),
                   key=lambda r: r.interleave_seq)
    assert [(r.doc_id, r.source_id) for r in again] == [(r.doc_id, r.source_id) for r in rows]


def test_weighted_interleave_validation(spark):
    import pytest

    from gdal_spark.text import weighted_interleave

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1]}))
    with pytest.raises(ValueError, match="same-length"):
        weighted_interleave([df], [0.5, 0.5])
    with pytest.raises(ValueError, match="positive"):
        weighted_interleave([df], [0.0])
