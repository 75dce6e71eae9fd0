"""Linear referencing (ogr/ogrlinestring.cpp Value :2118, Project
:2184, getSubLine :2237; apps/ogrlineref.cpp) — numpy primitives vs
scalar replicas of the reference loops, the getSubLine quirks, and the
Spark operators end-to-end."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.geom.ops import line_cumlen, line_project, line_substring, line_value

PATH = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 0.0], [10.0, 5.0], [4.0, 5.0]])
# includes one zero-length segment; total length = 10 + 5 + 6 = 21


def _ref_value(c, d):
    """Scalar replica of OGRSimpleCurve::Value."""
    if d < 0:
        return c[0]
    length = 0.0
    for i in range(len(c) - 1):
        sl = float(np.hypot(*(c[i + 1] - c[i])))
        if sl > 0:
            if length <= d <= length + sl:
                r = (d - length) / sl
                return c[i] * (1 - r) + c[i + 1] * r
            length += sl
    return c[-1]


def test_value_matches_reference_scan():
    dists = np.array([-3.0, 0.0, 4.0, 10.0, 12.5, 15.0, 18.0, 21.0, 30.0])
    got = line_value(PATH, dists)
    for k, d in enumerate(dists):
        assert np.allclose(got[k], _ref_value(PATH, d)), d


def test_project_roundtrip_and_clamp():
    # points exactly on the path project to their own measure
    ms = np.array([0.0, 3.0, 10.0, 12.0, 17.0, 21.0])
    pts = line_value(PATH, ms)
    back = line_project(PATH, pts[:, 0], pts[:, 1])
    assert np.allclose(back, ms)
    # off-path points: nearest-location measure
    assert line_project(PATH, np.array([5.0]), np.array([-2.0]))[0] == pytest.approx(5.0)
    assert line_project(PATH, np.array([100.0]), np.array([0.0]))[0] == pytest.approx(10.0)
    # tie between two segments -> FIRST segment wins
    m = line_project(np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]]),
                     np.array([8.0]), np.array([2.0]))
    assert m[0] == pytest.approx(8.0)  # not 10 + 2


def test_cumlen_skips_nothing():
    assert line_cumlen(PATH).tolist() == [0.0, 10.0, 10.0, 15.0, 21.0]


def test_substring_interior():
    got = line_substring(PATH, 4.0, 17.0)
    exp = np.array([[4.0, 0.0], [10.0, 0.0], [10.0, 0.0], [10.0, 5.0], [8.0, 5.0]])
    assert np.allclose(got, exp)


def test_substring_from_zero_duplicates_start_vertex():
    # the reference adds point 0 in the prologue AND in the vertex loop
    got = line_substring(PATH, 0.0, 5.0)
    assert np.allclose(got, [[0.0, 0.0], [0.0, 0.0], [5.0, 0.0]])


def test_substring_as_ratio_and_errors():
    got = line_substring(PATH, 0.5, 1.0, as_ratio=True)  # 10.5 .. 21
    assert np.allclose(got[0], [10.0, 0.5])
    assert np.allclose(got[-1], [4.0, 5.0])
    with pytest.raises(ValueError):
        line_substring(PATH, 5.0, 3.0)
    with pytest.raises(ValueError):
        line_substring(PATH, 21.0, 25.0)  # from >= length


def test_locate_points_chunked_equals_unchunked(spark):
    import gdal_spark.operators.lineref as lr

    rng = np.random.RandomState(7)
    path = np.cumsum(rng.randint(1, 5, size=(50, 2)).astype(float), axis=0)
    px = rng.uniform(path[:, 0].min() - 5, path[:, 0].max() + 5, 200)
    py = rng.uniform(path[:, 1].min() - 5, path[:, 1].max() + 5, 200)
    direct = lr.line_project(path, px, py)
    old = lr._SEG_CHUNK
    lr._SEG_CHUNK = 7
    try:
        chunked = lr._locate_chunked(path, px, py, round_d2=False)
    finally:
        lr._SEG_CHUNK = old
    assert np.allclose(chunked, direct)


def test_locate_points_spark(spark):
    from gdal_spark.operators.lineref import locate_points

    df = spark.createDataFrame(
        [(1, 3.0, -1.0), (2, 10.0, 2.5), (3, 7.0, 7.0)], "id long, x double, y double"
    )
    rows = {r["id"]: r for r in locate_points(df, PATH, "x", "y").collect()}
    assert rows[1]["measure"] == pytest.approx(3.0)
    assert (rows[1]["snap_x"], rows[1]["snap_y"]) == (3.0, 0.0)
    assert rows[2]["measure"] == pytest.approx(12.5)
    assert rows[3]["measure"] == pytest.approx(18.0)
    assert (rows[3]["snap_x"], rows[3]["snap_y"]) == (7.0, 5.0)


def test_reference_points_spark(spark):
    from gdal_spark.operators.lineref import reference_points

    got = {r["measure"]: (r["x"], r["y"]) for r in reference_points(spark, PATH, 7.0).collect()}
    assert sorted(got) == [0.0, 7.0, 14.0, 21.0]
    assert got[0.0] == (0.0, 0.0)
    assert got[7.0] == (7.0, 0.0)
    assert got[14.0] == (10.0, 4.0)
    assert got[21.0] == (4.0, 5.0)
