"""`gdal vector update` keyed upsert
(apps/gdalalg_vector_update.cpp:169-346).

The distributed operator is the closed form of the reference's
sequential replay against the live destination layer; `simulate`
below IS that replay, transliterated (per-src-feature loop, live
match count, SetFrom semantics, CreateFeature FID assignment), and
every test compares the Spark output row set + FIDs against it.
"""

from __future__ import annotations

import random

import pytest

from gdal_spark.relational import vector_update

DST_SCHEMA = ["_id", "k", "name", "extra"]  # extra = dst-only field
SRC_SCHEMA = ["_id", "k", "name", "srconly"]  # srconly dropped on output


def simulate(dst_rows, src_rows, keys, mode):
    """Literal replay of gdalalg_vector_update.cpp RunStep's feature
    loop (:230-346) against a live python list standing in for the
    dst layer."""
    dst = [dict(r) for r in dst_rows]
    next_fid = max([r["_id"] for r in dst], default=-1) + 1
    kc = ["_id"] if keys == ["FID"] else keys
    for s in sorted(src_rows, key=lambda r: r["_id"]):
        if any(s.get(k) is None for k in kc):
            continue  # :250-255 skip unset key
        matches = [d for d in dst if all(d[k] == s[k] for k in kc)]
        m = matches[0] if len(matches) == 1 else None  # :286-297
        if m is not None:
            if mode != "append-only":  # :313-324 SetFrom, FID kept
                for c in DST_SCHEMA:
                    if c == "_id":
                        continue
                    m[c] = s[c] if c in SRC_SCHEMA else None
        elif mode != "update-only":  # :333-343 CreateFeature
            new = {}
            for c in DST_SCHEMA:
                if c == "_id":
                    new[c] = next_fid
                elif c in SRC_SCHEMA:
                    new[c] = s[c]
                else:
                    new[c] = None
            next_fid += 1
            dst.append(new)
    return dst


def run(spark, dst_rows, src_rows, keys, mode):
    dst = spark.createDataFrame(
        [tuple(r[c] for c in DST_SCHEMA) for r in dst_rows],
        "_id long, k string, name string, extra string",
    )
    src = spark.createDataFrame(
        [tuple(r[c] for c in SRC_SCHEMA) for r in src_rows],
        "_id long, k string, name string, srconly string",
    )
    out = vector_update(dst, src, keys=keys, mode=mode)
    assert out.columns == DST_SCHEMA
    return [r.asDict() for r in out.collect()]


def norm(rows):
    return sorted(tuple(r[c] for c in DST_SCHEMA) for r in rows)


DST = [
    {"_id": 0, "k": "a", "name": "dA", "extra": "xa"},
    {"_id": 1, "k": "b", "name": "dB", "extra": "xb"},
    {"_id": 2, "k": "b", "name": "dB2", "extra": "xb2"},  # ambiguous key b
    {"_id": 5, "k": "c", "name": "dC", "extra": "xc"},
]

SRC = [
    {"_id": 0, "k": "a", "name": "s0", "srconly": "y0"},   # cnt==1
    {"_id": 1, "k": "a", "name": "s1", "srconly": "y1"},   # cnt==1 (last wins)
    {"_id": 2, "k": "b", "name": "s2", "srconly": "y2"},   # ambiguous
    {"_id": 3, "k": "b", "name": "s3", "srconly": "y3"},   # ambiguous
    {"_id": 4, "k": "z", "name": "s4", "srconly": "y4"},   # cnt==0
    {"_id": 6, "k": "z", "name": "s6", "srconly": "y6"},   # cnt==0 repeat
    {"_id": 7, "k": None, "name": "s7", "srconly": "y7"},  # null key: skipped
]


@pytest.mark.parametrize("mode", ["merge", "update-only", "append-only"])
def test_field_key_all_cardinalities(spark, mode):
    got = run(spark, DST, SRC, ["k"], mode)
    want = simulate(DST, SRC, ["k"], mode)
    assert norm(got) == norm(want)


@pytest.mark.parametrize("mode", ["merge", "update-only", "append-only"])
def test_fid_key(spark, mode):
    src = [
        {"_id": 1, "k": "q", "name": "n1", "srconly": "y"},  # matches fid 1
        {"_id": 9, "k": "r", "name": "n9", "srconly": "y"},  # no fid 9: append
    ]
    got = run(spark, DST, src, ["FID"], mode)
    want = simulate(DST, src, ["FID"], mode)
    assert norm(got) == norm(want)


@pytest.mark.parametrize("mode", ["merge", "update-only", "append-only"])
def test_fid_key_collides_with_assigned_fid(spark, mode):
    """The live-layer interaction: holes 3,4 append as FIDs 6,7; src
    FID 6 then MATCHES the appended FID 6 (GetFeature hits the fresh
    row) — merge SetFroms it, append-only leaves it, and NO duplicate
    FID 6 row may appear."""
    src = [
        {"_id": 3, "k": "h3", "name": "n3", "srconly": "y"},  # hole
        {"_id": 4, "k": "h4", "name": "n4", "srconly": "y"},  # hole
        {"_id": 6, "k": "c6", "name": "n6", "srconly": "y"},  # collides w/ assigned 6
    ]
    got = run(spark, DST, src, ["FID"], mode)
    want = simulate(DST, src, ["FID"], mode)
    assert norm(got) == norm(want)
    if mode == "merge":
        six = [r for r in got if r["_id"] == 6]
        assert len(six) == 1 and six[0]["name"] == "n6"
    if mode == "append-only":
        six = [r for r in got if r["_id"] == 6]
        assert len(six) == 1 and six[0]["name"] == "n3"


@pytest.mark.parametrize("mode", ["merge", "append-only"])
def test_fid_key_watermark_tail(spark, mode):
    """Past the assigned watermark (base+H) every later row appends:
    src 3 (hole -> FID 6), src 7 (> 6 = base+H-1+1? base=6, H=1,
    watermark 7: f=7 >= 7 appends as 7... the simulator decides) and
    src 20 far past the watermark."""
    src = [
        {"_id": 3, "k": "h", "name": "n3", "srconly": "y"},
        {"_id": 7, "k": "t", "name": "n7", "srconly": "y"},
        {"_id": 20, "k": "u", "name": "n20", "srconly": "y"},
    ]
    got = run(spark, DST, src, ["FID"], mode)
    want = simulate(DST, src, ["FID"], mode)
    assert norm(got) == norm(want)


def test_fid_key_randomized_against_replay(spark):
    rng = random.Random(7)
    for trial in range(4):
        dst = [
            {"_id": f, "k": f"d{f}", "name": f"dn{f}", "extra": f"x{f}"}
            for f in sorted(rng.sample(range(12), rng.randint(2, 8)))
        ]
        src = [
            {"_id": f, "k": f"s{f}", "name": f"sn{f}", "srconly": f"y{f}"}
            for f in sorted(rng.sample(range(18), rng.randint(3, 10)))
        ]
        for mode in ("merge", "update-only", "append-only"):
            got = run(spark, dst, src, ["FID"], mode)
            want = simulate(dst, src, ["FID"], mode)
            assert norm(got) == norm(want), (trial, mode)


def test_update_nulls_dst_only_field(spark):
    got = run(spark, DST, SRC[:1], ["k"], "merge")
    row = next(r for r in got if r["k"] == "a")
    assert row["name"] == "s0" and row["extra"] is None and row["_id"] == 0


def test_appended_fids_sequential_in_creation_order(spark):
    got = run(spark, DST, SRC, ["k"], "merge")
    appended = sorted(r["_id"] for r in got if r["_id"] > 5)
    # creations: key z at first occurrence (src fid 4), then ambiguous
    # b rows at src fids 2,3 -> creation order 2,3,4 -> fids 6,7,8
    assert appended == [6, 7, 8]
    want = simulate(DST, SRC, ["k"], "merge")
    assert norm(got) == norm(want)


def test_key_validation(spark):
    dst = spark.createDataFrame([(1, "a", "n", "e")], "_id long, k string, name string, extra string")
    src = spark.createDataFrame([(1, "a", "n", "s")], "_id long, k string, name string, srconly string")
    with pytest.raises(ValueError, match="Cannot find field"):
        vector_update(dst, src, keys=["nope"])
    with pytest.raises(ValueError, match="unknown mode"):
        vector_update(dst, src, keys=["k"], mode="bogus")
    src2 = spark.createDataFrame([(1, 1, "n")], "_id long, k int, name string")
    with pytest.raises(ValueError, match="not the same"):
        vector_update(dst, src2, keys=["k"])


def test_randomized_against_sequential_replay(spark):
    rng = random.Random(42)
    keyspace = [f"k{i}" for i in range(12)]
    for trial in range(3):
        dst, fid = [], 0
        for k in keyspace:
            for _ in range(rng.choice([0, 1, 1, 2, 3])):
                dst.append({"_id": fid, "k": k, "name": f"d{fid}", "extra": f"x{fid}"})
                fid += 1
        src = []
        for i in range(20):
            src.append({
                "_id": 100 + i,
                "k": rng.choice(keyspace + [None]),
                "name": f"s{i}",
                "srconly": f"y{i}",
            })
        for mode in ("merge", "update-only", "append-only"):
            got = run(spark, dst, src, ["k"], mode)
            want = simulate(dst, src, ["k"], mode)
            assert norm(got) == norm(want), (trial, mode)
