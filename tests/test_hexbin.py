"""Hexagonal binning (cells.hex_cell_cols): pure-Catalyst axial
assignment must match the numpy twin and assign every point to its
NEAREST hex center (the defining property of cube rounding)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.operators.cells import hex_cell_cols, hex_center_cols

SIZE = 37.0


def _hexbin_np(x, y, size=SIZE):
    q = (np.sqrt(3.0) / 3.0 * x - y / 3.0) / size
    r = (y * 2.0 / 3.0) / size
    s = -q - r
    rx, ry, rz = np.floor(q + 0.5), np.floor(s + 0.5), np.floor(r + 0.5)
    dx, dy, dz = np.abs(rx - q), np.abs(ry - s), np.abs(rz - r)
    xl = (dx > dy) & (dx > dz)
    hq = np.where(xl, -ry - rz, rx)
    hr = np.where(~xl & ~(dy > dz), -rx - ry, rz)
    return hq.astype(np.int64), hr.astype(np.int64)


def test_catalyst_matches_numpy_twin(spark):
    rng = np.random.default_rng(21)
    x = rng.uniform(-1000.0, 442000.0, 3000)
    y = rng.uniform(-1000.0, 3752000.0, 3000)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    hq, hr = hex_cell_cols(F.col("x"), F.col("y"), SIZE)
    got = df.select(hq.alias("hq"), hr.alias("hr")).toPandas()
    eq, er = _hexbin_np(x, y)
    assert (got["hq"].to_numpy(np.int64) == eq).all()
    assert (got["hr"].to_numpy(np.int64) == er).all()


def test_nearest_center_property(spark):
    rng = np.random.default_rng(22)
    x = rng.uniform(0.0, 5000.0, 2000)
    y = rng.uniform(0.0, 5000.0, 2000)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    hq, hr = hex_cell_cols(F.col("x"), F.col("y"), SIZE)
    binned = df.select("x", "y", hq.alias("hq"), hr.alias("hr"))
    cx, cy = hex_center_cols(F.col("hq"), F.col("hr"), SIZE)
    out = binned.select("x", "y", "hq", "hr", cx.alias("cx"), cy.alias("cy")).toPandas()
    d0 = np.hypot(out.x - out.cx, out.y - out.cy)
    # distance to assigned center never exceeds the circumradius ...
    assert (d0 <= SIZE + 1e-9).all()
    # ... and no neighboring hex center is strictly closer
    hqv, hrv = out.hq.to_numpy(float), out.hr.to_numpy(float)
    for dq, dr in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
        nx = SIZE * (np.sqrt(3.0) * (hqv + dq) + np.sqrt(3.0) / 2.0 * (hrv + dr))
        ny = SIZE * 1.5 * (hrv + dr)
        assert (np.hypot(out.x - nx, out.y - ny) >= d0 - 1e-9).all()


def test_codegen_plan_no_python(spark):
    # the binning must stay JVM-side: no BatchEvalPython / ArrowEval
    # in the plan (it's all floor/abs/when arithmetic)
    df = spark.range(100).select(
        (F.col("id") * 13.0).alias("x"), (F.col("id") * 7.0).alias("y")
    )
    hq, hr = hex_cell_cols(F.col("x"), F.col("y"), SIZE)
    plan = df.select(hq.alias("hq"), hr.alias("hr"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
