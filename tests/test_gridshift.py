"""Datum grid-shift machinery (geom/gridshift.py — the PROJ
hgridshift / +nadgrids= role in /root/reference/ogr/ogrct.cpp
pipelines). Grids themselves are data; these tests drive the
transform with synthetic analytic lattices."""

from __future__ import annotations

import numpy as np

from gdal_spark.geom.gridshift import GridShift, synthetic_grid
from gdal_spark.geom.proj import Pipeline, utm


def _linear_grid():
    # bilinear interpolation reproduces BILINEAR fields exactly —
    # an analytic oracle for any in-grid point
    return synthetic_grid(
        lat_min=30.0, lon_min=-120.0, dlat=0.5, dlon=0.5, nrows=21, ncols=41,
        lat_fn=lambda lon, lat: 0.8 + 0.01 * (lon + 120) + 0.02 * (lat - 30),
        lon_fn=lambda lon, lat: 1.5 - 0.03 * (lon + 120) + 0.005 * (lat - 30),
    )


class TestGridShift:
    def test_forward_matches_analytic_field(self):
        gs = GridShift([_linear_grid()])
        rng = np.random.default_rng(3)
        lon = rng.uniform(-119.9, -100.1, 200)
        lat = rng.uniform(30.1, 39.9, 200)
        flon, flat = gs.forward(lon, lat)
        want_dlat = (0.8 + 0.01 * (lon + 120) + 0.02 * (lat - 30)) / 3600.0
        want_dlon = (1.5 - 0.03 * (lon + 120) + 0.005 * (lat - 30)) / 3600.0
        np.testing.assert_allclose(flat - lat, want_dlat, rtol=1e-10)
        # NTv2 west-positive: lon shift is SUBTRACTED
        np.testing.assert_allclose(lon - flon, want_dlon, rtol=1e-10)

    def test_inverse_round_trips(self):
        gs = GridShift([_linear_grid()])
        rng = np.random.default_rng(7)
        lon = rng.uniform(-119.9, -100.1, 500)
        lat = rng.uniform(30.1, 39.9, 500)
        flon, flat = gs.forward(lon, lat)
        blon, blat = gs.inverse(flon, flat)
        np.testing.assert_allclose(blon, lon, atol=1e-11)
        np.testing.assert_allclose(blat, lat, atol=1e-11)

    def test_outside_grid_passes_through(self):
        gs = GridShift([_linear_grid()])
        lon = np.array([0.0, -150.0])
        lat = np.array([50.0, 10.0])
        flon, flat = gs.forward(lon, lat)
        np.testing.assert_array_equal(flon, lon)
        np.testing.assert_array_equal(flat, lat)

    def test_denser_subgrid_wins(self):
        parent = _linear_grid()
        child = synthetic_grid(
            lat_min=33.0, lon_min=-112.0, dlat=0.1, dlon=0.1, nrows=21, ncols=21,
            lat_fn=lambda lon, lat: np.full_like(lon, 10.0),
            lon_fn=lambda lon, lat: np.zeros_like(lon),
        )
        gs = GridShift([parent, child])  # NTv2 rule: last containing grid
        # inside the child window
        flon, flat = gs.forward(np.array([-111.0]), np.array([34.0]))
        np.testing.assert_allclose(flat[0] - 34.0, 10.0 / 3600.0, rtol=1e-9)
        # outside the child, inside the parent -> parent field
        flon2, flat2 = gs.forward(np.array([-105.0]), np.array([38.0]))
        want = (0.8 + 0.01 * 15 + 0.02 * 8) / 3600.0
        np.testing.assert_allclose(flat2[0] - 38.0, want, rtol=1e-10)

    def test_grid_node_exact(self):
        g = _linear_grid()
        gs = GridShift([g])
        # exactly on a lattice node: interpolation == node value
        lon, lat = -119.5, 31.0
        flon, flat = gs.forward(np.array([lon]), np.array([lat]))
        i = int(round((lat - g.lat_min) / g.dlat))
        j = int(round((lon - g.lon_min) / g.dlon))
        np.testing.assert_allclose((flat[0] - lat) * 3600.0, g.shift_lat[i, j], rtol=1e-9)

    def test_pipeline_with_datum_shift(self):
        """UTM(NAD27-era zone) -> gridshift -> WebMercator composed
        round trip through Pipeline (the ogrct.cpp chain shape)."""
        gs = GridShift([_linear_grid()])
        pipe = Pipeline(src=utm(11), dst="webmercator", shift=gs)
        rng = np.random.default_rng(11)
        lon = rng.uniform(-118.9, -116.1, 50)
        lat = rng.uniform(31.1, 35.9, 50)
        x, y = utm(11).forward(lon, lat)
        wx, wy = pipe.forward(x, y)
        bx, by = pipe.inverse(wx, wy)
        np.testing.assert_allclose(bx, x, atol=1e-5)  # ~1e-5 m on UTM meters
        np.testing.assert_allclose(by, y, atol=1e-5)
        # the shift actually moved things: compare against no-shift pipe
        nx, ny = Pipeline(src=utm(11), dst="webmercator").forward(x, y)
        assert np.abs(nx - wx).max() > 10.0  # tens of meters at 1.5 arcsec

    def test_shiftgrid_contains_edges(self):
        g = _linear_grid()
        assert g.contains(np.array([g.lon_min]), np.array([g.lat_min]))[0]
        assert g.contains(np.array([g.lon_max]), np.array([g.lat_max]))[0]
        assert not g.contains(np.array([g.lon_max + 0.01]), np.array([g.lat_max]))[0]

    def test_broadcast_roundtrip_in_spark(self, spark):
        """The GridShift broadcasts and runs inside mapInPandas — the
        distributed reprojection shape (broadcast the lattice, shift
        per Arrow batch)."""
        import pandas as pd
        from pyspark.sql import Row

        gs = GridShift([_linear_grid()])
        bc = spark.sparkContext.broadcast(gs)
        rng = np.random.default_rng(13)
        rows = [Row(i=i, lon=float(lo), lat=float(la)) for i, (lo, la) in enumerate(
            zip(rng.uniform(-119, -101, 100), rng.uniform(30.5, 39.5, 100)))]
        df = spark.createDataFrame(rows)

        def _shift(batches):
            for pdf in batches:
                lon2, lat2 = bc.value.forward(pdf["lon"].to_numpy(), pdf["lat"].to_numpy())
                yield pd.DataFrame({"i": pdf["i"], "lon2": lon2, "lat2": lat2})

        out = df.mapInPandas(_shift, "i long, lon2 double, lat2 double").toPandas()
        out = out.sort_values("i").reset_index(drop=True)
        lon = np.array([r.lon for r in rows])
        lat = np.array([r.lat for r in rows])
        flon, flat = gs.forward(lon, lat)
        np.testing.assert_allclose(out["lon2"].to_numpy(), flon, rtol=1e-14)
        np.testing.assert_allclose(out["lat2"].to_numpy(), flat, rtol=1e-14)
