"""Regression tests for the third round-4 adversarial review batch:
set_field_type leading zeros, dense_seq float-span buckets, sparse
halo>1 remainder parity, Horn aspect -trigonometric normalization,
as_features_layer duplicate bands, proximity sparse use_input_nodata."""

from __future__ import annotations

import dataclasses

import numpy as np

from gdal_spark.operators.focal import aspect_kernel, focal_mean, zt_aspect_kernel
from gdal_spark.operators.proximity import proximity
from gdal_spark.operators.raster import RasterSpec, as_features_layer, materialize_full
from gdal_spark.operators.vector_sort import dense_seq
from gdal_spark.relational import set_field_type


def _tiles_from(spark, arr, spec, drop=()):
    rows = []
    for ty in range(spec.ntiles_y):
        for tx in range(spec.ntiles_x):
            if (ty, tx) in drop:
                continue
            h, w = spec.tile_shape(ty, tx)
            oy, ox = ty * spec.tile_size, tx * spec.tile_size
            rows.append((1, ty, tx, h, w, str(arr.dtype),
                         bytes(arr[oy:oy + h, ox:ox + w].tobytes())))
    return spark.createDataFrame(
        rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary")


def test_set_field_type_leading_zeros(spark):
    """'0...042' (39+ chars) must parse to 42, not clamp (strtoll
    ignores leading zeros; only SIGNIFICANT digits overflow)."""
    df = spark.createDataFrame(
        [("0" * 38 + "42",), ("-" + "0" * 38 + "7",), ("9" * 40,)], "v string")
    got = [r.v for r in set_field_type(df, "v", "bigint").collect()]
    assert got == [42, -7, 9223372036854775807]


def test_dense_seq_small_float_span(spark):
    """Float keys with span << 1 must still spread across buckets (the
    old span+1.0 denominator collapsed them all into bucket 0)."""
    import pyspark.sql.functions as F

    n = 64
    df = spark.createDataFrame(
        [(i, 0.0005 * i / n) for i in range(n)], "fid long, k double")
    out = dense_seq(df, "k", "fid")
    got = {r.fid: r.seq for r in out.collect()}
    assert got == {i: i for i in range(n)}
    # the bucket formula itself (mirrored) must use >1 bucket
    mn, mx = 0.0, 0.0005 * (n - 1) / n
    span = mx - mn
    b = df.select(
        F.least(F.floor((F.col("k") - F.lit(mn)) * 1024 / F.lit(span)).cast("int"),
                F.lit(1023)).alias("b"))
    assert b.distinct().count() > 32


def test_focal_mean_halo2_remainder_parity(spark):
    """17x17 raster, tile 16 -> remainder tiles of 1 px: halo=2
    distributed focal_mean must equal the whole-array np.pad oracle,
    and a sparse table with the init-valued corner tile dropped must
    equal the dense run (the old full-block replication kept stale
    center values beyond a sub-halo neighbor)."""
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 255, size=(17, 17)).astype(np.float64)
    spec = RasterSpec(width=17, height=17,
                      gt=(0.0, 1.0, 0.0, 17.0, 0.0, -1.0),
                      dtype="float64", nbands=1, tile_size=16)
    dense = materialize_full(focal_mean(_tiles_from(spark, arr, spec), spec, size=5), spec)
    p = np.pad(arr, 2, mode="edge")
    c = np.cumsum(np.cumsum(p, axis=0), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)))
    s = (c[5:5 + 17, 5:5 + 17] - c[0:17, 5:5 + 17]
         - c[5:5 + 17, 0:17] + c[0:17, 0:17])
    np.testing.assert_allclose(dense, s / 25.0, rtol=0, atol=1e-9)
    arr2 = arr.copy()
    arr2[16:, 16:] = 0.0  # the corner tile at init
    dense2 = materialize_full(
        focal_mean(_tiles_from(spark, arr2, spec), spec, size=5), spec)
    sparse2 = materialize_full(
        focal_mean(_tiles_from(spark, arr2, spec, drop={(1, 1)}), spec, size=5), spec)
    np.testing.assert_array_equal(dense2, sparse2)


def test_aspect_trigonometric_range():
    """Horn aspect with angle_as_azimuth=False: 0..360 like the
    reference (aspect<0 += 360; ==360 wraps to 0), matching the ZT
    variant on the same inputs."""
    rng = np.random.default_rng(3)
    p = rng.normal(size=(8, 8)) * 10
    horn = aspect_kernel(angle_as_azimuth=False)(p)
    valid = horn != -9999.0
    assert (horn[valid] >= 0.0).all() and (horn[valid] < 360.0).all()
    # a south-facing cell: dy<0 -> raw atan2 negative -> +360
    ramp = np.outer(np.arange(5, 0, -1.0), np.ones(5))  # increases northward
    a = aspect_kernel(angle_as_azimuth=False)(ramp)[2, 2]
    z = zt_aspect_kernel(angle_as_azimuth=False)(ramp)[2, 2]
    assert a == z == 270.0  # atan2(-dy')= -90 -> 270


def test_as_features_layer_rejects_duplicate_bands(spark):
    spec = RasterSpec(width=4, height=4, gt=(0, 1, 0, 4, 0, -1),
                      dtype="float64", nbands=1, tile_size=4)
    t = _tiles_from(spark, np.zeros((4, 4)), spec)
    import pytest

    with pytest.raises(ValueError, match="duplicate band"):
        as_features_layer(t, spec, bands=[1, 1])
    with pytest.raises(ValueError, match="out of range"):
        as_features_layer(t, spec, bands=[2])


def test_proximity_sparse_use_input_nodata_init(spark):
    """Sparse table with init == src_nodata: absent-tile pixels must
    mask to the output nodata exactly like the dense equivalent."""
    spec = RasterSpec(width=20, height=20, gt=(0, 1, 0, 20, 0, -1),
                      dtype="float64", nbands=1, tile_size=16, init=5.0)
    arr = np.full((20, 20), 5.0)
    arr[2, 2] = 1.0  # one target
    arr[0:16, 0:16][10, 10] = 7.0  # a plain pixel
    kw = dict(target_values=[1.0], use_input_nodata=True,
              src_nodata=5.0, nodata=65535.0)
    dense = materialize_full(proximity(_tiles_from(spark, arr, spec), spec, **kw), spec)
    sparse = materialize_full(
        proximity(_tiles_from(spark, arr, spec, drop={(1, 1)}), spec, **kw), spec)
    np.testing.assert_array_equal(dense, sparse)
    assert dense[18, 18] == 65535.0  # init==src_nodata pixel masked
    assert dense[10, 10] != 65535.0


# --- round-4 late review batch regressions -------------------------------


def test_dense_seq_null_keys_rank_first(spark):
    """NULL ordering keys: OGR NULLS-FIRST — their own bucket ahead of
    every value bucket; previously the driver cumsum crashed (None vs
    int) or the offset inner join silently dropped the rows."""
    df = spark.createDataFrame(
        [(None, 10), (5.0, 11), (None, 12), (1.0, 13)], "k double, fid int"
    )
    got = {r.fid: r.seq for r in dense_seq(df, "k", "fid").collect()}
    assert got == {10: 0, 12: 1, 13: 2, 11: 3}
    # all-NULL keys: pure tie order
    df2 = spark.createDataFrame([(None, 3), (None, 1)], "k double, fid int")
    got2 = {r.fid: r.seq for r in dense_seq(df2, "k", "fid").collect()}
    assert got2 == {1: 0, 3: 1}


def test_vector_info_lowercase_z_stride(spark):
    """'point z (1 2 5)' (accepted by the IGNORECASE WKT parser): the
    Z value 5 must not contaminate the extent."""
    from gdal_spark.operators.info import vector_info

    df = spark.createDataFrame([("point z (1 2 5)",)], "wkt string")
    r = vector_info(df).first()
    assert (r.minx, r.miny, r.maxx, r.maxy) == (1.0, 2.0, 1.0, 2.0)


def test_interp_points_sparse_absent_tile_init(spark):
    """Default (non-exact-seams) path: a point keying into an
    in-bounds tile ABSENT from a sparse table samples the init canvas
    instead of silently dropping (parity with the exact_seams path)."""
    from gdal_spark.operators.grid import interpolate_at_points

    spec = RasterSpec(width=32, height=32, gt=(0, 1, 0, 32, 0, -1),
                      dtype="float64", tile_size=16, init=7.0)
    arr = np.arange(32 * 32, dtype=np.float64).reshape(32, 32)
    tiles = _tiles_from(spark, arr, spec, drop={(1, 1)})  # drop (ty=1, tx=1)
    pts = spark.createDataFrame(
        [(0, 24.5, 2.5), (1, 2.5, 29.5)], "pid int, x double, y double"
    )  # pid 0 -> absent tile (ty=1,tx=1); pid 1 -> present tile
    for seams in (False, True):
        got = {r.pid: r.value for r in interpolate_at_points(
            tiles, spec, pts, method="nearest", exact_seams=seams).collect()}
        assert got[0] == 7.0, seams
        assert got[1] == arr[2, 2], seams


def test_densify_band_subset(spark):
    """densify(bands=[...]) synthesizes keys only for the selected
    bands — nothing ships for bands the caller will not read."""
    from gdal_spark.operators.raster import TILE_SCHEMA, densify

    spec = RasterSpec(width=32, height=16, gt=(0, 1, 0, 16, 0, -1),
                      dtype="uint8", nbands=3, tile_size=16)
    pay = np.zeros((16, 16), np.uint8).tobytes()
    tiles = spark.createDataFrame([(2, 0, 0, 16, 16, "uint8", pay)], TILE_SCHEMA)
    out = densify(tiles, spec, bands=[2]).select("band", "ty", "tx").collect()
    assert sorted((r.band, r.ty, r.tx) for r in out) == [(2, 0, 0), (2, 0, 1)]


def test_proximity_init_is_target_sparse(spark):
    """When spec.init itself is a target value, absent sparse tiles
    are all-target blocks (distance 0 conducting outward) — parity
    with the dense equivalent."""
    spec = RasterSpec(width=32, height=32, gt=(0, 1, 0, 32, 0, -1),
                      dtype="float64", nbands=1, tile_size=16, init=1.0)
    arr = np.full((32, 32), 1.0)   # everything target at init
    arr[0:16, 0:16] = 0.0          # except the top-left tile
    dense = materialize_full(
        proximity(_tiles_from(spark, arr, spec), spec, target_values=[1.0]), spec)
    sparse = materialize_full(
        proximity(_tiles_from(spark, arr, spec, drop={(1, 1)}), spec,
                  target_values=[1.0]), spec)
    np.testing.assert_array_equal(dense, sparse)
    assert dense[0, 0] > 0 and dense[20, 20] == 0.0


def test_raster_create_nodata_sidecar_and_uniform_rounding():
    from gdal_spark.operators.create import raster_create

    spec, _ = raster_create(size=(8, 8), nodata=5.0)
    assert getattr(spec, "nodata", None) == 5.0
    spec, _ = raster_create(size=(8, 8), nodata="none")
    assert getattr(spec, "nodata", None) is None
    # uniform burn rounds through GDALCopyWord (250.9 -> 251), so
    # densify's np.full and materialize_full agree on the pixel value
    spec, _ = raster_create(size=(8, 8), burn=[250.9])
    assert spec.init == 251.0


def test_raster_create_degenerate_sizing_errors():
    import pytest as _pytest

    from gdal_spark.operators.create import raster_create

    with _pytest.raises(ValueError, match="Invalid raster size"):
        raster_create(size=(0, 50))
    # res zero-axis substitution applies in the bbox branch too
    spec, _ = raster_create(bbox=(0.0, 0.0, 100.0, 50.0), resolution=(10.0, 0.0))
    assert (spec.width, spec.height) == (10, 5)
    with _pytest.raises(ValueError, match="Invalid resolution"):
        raster_create(bbox=(0.0, 0.0, 100.0, 50.0), resolution=(0.0, 0.0))


def test_tile_index_utm_false_northing_wkt(spark):
    """Coordinates >= 1e7 (UTM false northing) must render as plain
    decimals — Spark's cast would emit '1.0E7', which is not WKT."""
    from gdal_spark.operators.tindex import tile_index

    meta = spark.createDataFrame(
        [("a.tif", 100, 100, [500000.0, 10.0, 0.0, 10000000.0, 0.0, -10.0])],
        "location string, width int, height int, gt array<double>",
    )
    r = tile_index(meta).first()
    assert "E" not in r.wkt and "e" not in r.wkt.replace("POLYGON", "")
    assert "10000000.0" in r.wkt and "500000.0" in r.wkt
