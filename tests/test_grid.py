"""Gridding (IDW) and interpolate-at-point tests against local numpy
references (gdalgrid invdist semantics)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from gdal_spark.fixtures import BYTE20, BYTE20_SPEC, byte20_tiles
from gdal_spark.operators.grid import idw_grid, interpolate_at_points
from gdal_spark.operators.raster import RasterSpec

SPEC8 = RasterSpec(width=8, height=8, gt=(0.0, 1.0, 0.0, 8.0, 0.0, -1.0), dtype="float64", tile_size=4)


def _mat(tiles, spec):
    arr = np.zeros((spec.height, spec.width), dtype=np.float64)
    for r in tiles.collect():
        t = np.frombuffer(r.payload, dtype=r.dtype).reshape(r.h, r.w)
        arr[r.ty * spec.tile_size : r.ty * spec.tile_size + r.h,
            r.tx * spec.tile_size : r.tx * spec.tile_size + r.w] = t
    return arr


def _idw_ref(pts, spec, power=2.0, radius=np.inf, nodata=0.0):
    out = np.full((spec.height, spec.width), np.nan)
    for i in range(spec.height):
        for j in range(spec.width):
            cx, cy = spec.pixel_to_world(j + 0.5, i + 0.5)
            num = den = 0.0
            exact = None
            for x, y, z in pts:
                d2 = (cx - x) ** 2 + (cy - y) ** 2
                if d2 < 1e-25:
                    exact = z
                elif d2 <= radius * radius:
                    w = d2 ** (-power / 2.0)
                    num += w * z
                    den += w
            out[i, j] = exact if exact is not None else (num / den if den > 0 else nodata)
    return out


class TestIDW:
    PTS = [(1.5, 6.5, 10.0), (6.5, 1.5, 50.0), (4.0, 4.0, 30.0)]

    def test_idw_matches_reference(self, spark):
        pts = spark.createDataFrame([Row(x=x, y=y, z=z) for x, y, z in self.PTS])
        got = _mat(idw_grid(pts, SPEC8), SPEC8)
        np.testing.assert_allclose(got, _idw_ref(self.PTS, SPEC8), rtol=1e-12)

    def test_idw_radius_and_nodata(self, spark):
        pts = spark.createDataFrame([Row(x=1.5, y=6.5, z=10.0)])
        got = _mat(idw_grid(pts, SPEC8, radius=2.0, nodata=-1.0), SPEC8)
        want = _idw_ref([(1.5, 6.5, 10.0)], SPEC8, radius=2.0, nodata=-1.0)
        np.testing.assert_allclose(got, want, rtol=1e-12)
        assert (got == -1.0).any()  # cells beyond the radius

    def test_grid_modes_match_brute_force(self, spark):
        """nearest / average / data metrics vs per-cell replicas
        (alg/gdalgrid.cpp GGA_* semantics)."""
        from gdal_spark.operators.grid import grid_points

        rng = np.random.default_rng(5)
        pts = [(float(x), float(y), float(z)) for x, y, z in
               zip(rng.uniform(0, 8, 12), rng.uniform(0, 8, 12), rng.integers(1, 100, 12))]
        df = spark.createDataFrame([Row(x=x, y=y, z=z) for x, y, z in pts])
        R = 2.5

        def brute(algo):
            out = np.zeros((8, 8))
            for i in range(8):
                for j in range(8):
                    cx, cy = SPEC8.pixel_to_world(j + 0.5, i + 0.5)
                    sel = [(x, y, z, ((cx - x) ** 2 + (cy - y) ** 2) ** 0.5)
                           for x, y, z in pts if (cx - x) ** 2 + (cy - y) ** 2 <= R * R]
                    if not sel:
                        out[i, j] = -1 if algo != "count" else 0
                        continue
                    zs = [z for _, _, z, _ in sel]
                    if algo == "nearest":
                        out[i, j] = min(sel, key=lambda t: (t[3], t[0], t[1], t[2]))[2]
                    elif algo == "average":
                        out[i, j] = sum(zs) / len(zs)
                    elif algo == "minimum":
                        out[i, j] = min(zs)
                    elif algo == "maximum":
                        out[i, j] = max(zs)
                    elif algo == "range":
                        out[i, j] = max(zs) - min(zs)
                    elif algo == "count":
                        out[i, j] = len(zs)
                    else:
                        out[i, j] = sum(d for *_, d in sel) / len(sel)
            return out

        for algo in ("nearest", "average", "minimum", "maximum", "range", "count", "average_distance"):
            got = _mat(grid_points(df, SPEC8, algo=algo, radius=R, nodata=-1.0), SPEC8)
            np.testing.assert_allclose(got, brute(algo), rtol=1e-9, err_msg=algo)

    def test_point_on_center_shortcircuits(self, spark):
        pts = spark.createDataFrame([Row(x=0.5, y=7.5, z=99.0), Row(x=2.5, y=7.5, z=1.0)])
        got = _mat(idw_grid(pts, SPEC8), SPEC8)
        assert got[0, 0] == 99.0 and got[0, 2] == 1.0


class TestSearchEllipse:
    """Rotated search ellipse + smoothing + min/max points
    (gdalgrid.cpp:124-176 GDALGridInverseDistanceToAPower options)."""

    PTS = [(1.1, 6.2, 10.0), (6.6, 1.4, 50.0), (4.0, 4.1, 30.0),
           (2.2, 2.3, 5.0), (5.5, 6.0, 77.0), (3.1, 5.2, 12.0)]

    @staticmethod
    def _brute(pts, spec, algo, r1, r2, angle_deg, power=2.0, smoothing=0.0,
               min_points=0, max_points=0, nodata=-1.0):
        """Scalar replica of gdalgrid.cpp:141-189 (rotate offsets by
        -angle; membership r2²x'²+r1²y'² <= r1²r2²; weight on
        UNROTATED d²+smoothing²; break after n > max_points)."""
        a = np.deg2rad(angle_deg)
        ca, sa = np.cos(a), np.sin(a)
        out = np.full((spec.height, spec.width), np.nan)
        for i in range(spec.height):
            for j in range(spec.width):
                cx, cy = spec.pixel_to_world(j + 0.5, i + 0.5)
                num = den = 0.0
                n = 0
                exact = None
                sel = []
                for x, y, z in sorted(pts):
                    dx, dy = x - cx, y - cy
                    rw2 = dx * dx + dy * dy + smoothing * smoothing
                    rx = dx * ca + dy * sa
                    ry = dy * ca - dx * sa
                    if r2 * r2 * rx * rx + r1 * r1 * ry * ry <= (r1 * r1) * (r2 * r2):
                        if rw2 < 1e-13:
                            exact = z
                            break
                        num += z / rw2 ** (power / 2.0)
                        den += 1.0 / rw2 ** (power / 2.0)
                        n += 1
                        sel.append((np.sqrt(dx * dx + dy * dy), z))
                        if max_points > 0 and n > max_points:
                            break
                if algo == "invdist":
                    if exact is not None:
                        out[i, j] = exact
                    elif den == 0 or (min_points > 0 and n < min_points):
                        out[i, j] = nodata
                    else:
                        out[i, j] = num / den
                elif algo == "count":
                    out[i, j] = len(sel)
                elif algo == "nearest":
                    out[i, j] = min(sel)[1] if sel else nodata
        return out

    def test_rotated_ellipse_invdist(self, spark):
        df = spark.createDataFrame([Row(x=x, y=y, z=z) for x, y, z in self.PTS])
        got = _mat(idw_grid(df, SPEC8, radius=3.0, radius2=1.2, angle=30.0, nodata=-1.0), SPEC8)
        want = self._brute(self.PTS, SPEC8, "invdist", 3.0, 1.2, 30.0)
        np.testing.assert_allclose(got, want, rtol=1e-12)
        # anisotropy is real: the circular result differs
        circ = _mat(idw_grid(df, SPEC8, radius=3.0, nodata=-1.0), SPEC8)
        assert not np.allclose(got, circ)

    def test_ellipse_metrics_count(self, spark):
        from gdal_spark.operators.grid import grid_points

        df = spark.createDataFrame([Row(x=x, y=y, z=z) for x, y, z in self.PTS])
        got = _mat(grid_points(df, SPEC8, algo="count", radius=2.5, radius2=1.0,
                               angle=-45.0, nodata=0.0), SPEC8)
        want = self._brute(self.PTS, SPEC8, "count", 2.5, 1.0, -45.0)
        np.testing.assert_allclose(got, want)

    def test_smoothing_weight(self, spark):
        df = spark.createDataFrame([Row(x=x, y=y, z=z) for x, y, z in self.PTS])
        got = _mat(idw_grid(df, SPEC8, radius=4.0, smoothing=1.5, nodata=-1.0), SPEC8)
        want = self._brute(self.PTS, SPEC8, "invdist", 4.0, 4.0, 0.0, smoothing=1.5)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_min_max_points(self, spark):
        from gdal_spark.operators.grid import grid_points

        df = spark.createDataFrame([Row(x=x, y=y, z=z) for x, y, z in self.PTS])
        got = _mat(grid_points(df, SPEC8, algo="invdist", radius=2.0,
                               min_points=3, nodata=-1.0), SPEC8)
        want = self._brute(self.PTS, SPEC8, "invdist", 2.0, 2.0, 0.0, min_points=3)
        np.testing.assert_allclose(got, want, rtol=1e-12)
        assert (got == -1.0).any()
        got = _mat(grid_points(df, SPEC8, algo="invdist", radius=5.0,
                               max_points=2, nodata=-1.0), SPEC8)
        want = self._brute(self.PTS, SPEC8, "invdist", 5.0, 5.0, 0.0, max_points=2)
        np.testing.assert_allclose(got, want, rtol=1e-12)


class TestInterpolateAtPoints:
    def test_nearest_matches_pixels(self, spark):
        pts = spark.createDataFrame(
            [Row(pid=0, x=440720.0 + 3 * 60 + 30, y=3751320.0 - 5 * 60 - 30)]
        )
        out = interpolate_at_points(byte20_tiles(spark), BYTE20_SPEC, pts, method="nearest").collect()
        assert out[0].value == float(BYTE20[5, 3])

    def test_bilinear_interior(self, spark):
        # at an interior pixel center, bilinear == the pixel value
        pts = spark.createDataFrame(
            [Row(pid=0, x=440720.0 + 7 * 60 + 30.0, y=3751320.0 - 9 * 60 - 30.0)]
        )
        out = interpolate_at_points(byte20_tiles(spark), BYTE20_SPEC, pts).collect()
        assert out[0].value == pytest.approx(float(BYTE20[9, 7]))

    def test_bilinear_midpoint(self, spark):
        # midway between two horizontal neighbor centers -> their mean
        pts = spark.createDataFrame(
            [Row(pid=1, x=440720.0 + 8 * 60.0, y=3751320.0 - 9 * 60 - 30.0)]
        )
        out = interpolate_at_points(byte20_tiles(spark), BYTE20_SPEC, pts).collect()
        want = (float(BYTE20[9, 7]) + float(BYTE20[9, 8])) / 2
        assert out[0].value == pytest.approx(want)


class TestDelaunayLinear:
    def test_triangulation_empty_circumcircle_property(self):
        """Delaunay invariant: no point strictly inside any triangle's
        circumcircle."""
        from gdal_spark.geom.delaunay import _circumcircle, delaunay

        rng = np.random.default_rng(41)
        pts = rng.uniform(0, 100, size=(40, 2))
        tris = delaunay(pts)
        assert len(tris) > 0
        for t in tris:
            ux, uy, r2 = _circumcircle(*pts[t[0]], *pts[t[1]], *pts[t[2]])
            d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
            inside = d2 < r2 * (1 - 1e-9)
            inside[t] = False
            assert not inside.any()

    def test_collinear_degenerate(self):
        from gdal_spark.geom.delaunay import delaunay

        pts = np.array([[0, 0], [1, 1], [2, 2], [3, 3]], float)
        assert len(delaunay(pts)) == 0

    def test_linear_reproduces_plane(self, spark):
        """Points sampled from z = 2x + 3y + 1: barycentric
        interpolation inside the hull must reproduce the plane exactly
        (triangulation-independent property)."""
        from pyspark.sql import Row

        from gdal_spark.operators.grid import grid_points

        rng = np.random.default_rng(47)
        xs = np.concatenate([rng.uniform(0, 8, 20), [0, 8, 0, 8]])
        ys = np.concatenate([rng.uniform(0, 8, 20), [0, 0, 8, 8]])
        zs = 2 * xs + 3 * ys + 1
        df = spark.createDataFrame(
            [Row(x=float(x), y=float(y), z=float(z)) for x, y, z in zip(xs, ys, zs)]
        )
        got = _mat(grid_points(df, SPEC8, algo="linear", radius=0, nodata=-1), SPEC8)
        jj, ii = np.meshgrid(np.arange(8), np.arange(8))
        cx, cy = SPEC8.pixel_to_world(jj + 0.5, ii + 0.5)
        want = 2 * cx + 3 * cy + 1
        # the corner points make the hull cover every cell center
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_linear_distributed_matches_driver_path(self, spark):
        """Above the driver-size guard the LINEAR path switches to
        tile-local triangulation over halo-joined points; with an
        adequate halo it must reproduce the driver-global result
        (round-2 verdict scale item)."""
        from pyspark.sql import Row

        from gdal_spark.operators.grid import _linear_grid

        spec = RasterSpec(width=16, height=16, gt=(0.0, 1.0, 0.0, 16.0, 0.0, -1.0), dtype="float64", tile_size=4)
        rng = np.random.default_rng(11)
        xs = np.concatenate([rng.uniform(0, 16, 150), [0, 16, 0, 16]])
        ys = np.concatenate([rng.uniform(0, 16, 150), [0, 0, 16, 16]])
        zs = np.sin(xs) + np.cos(ys) * 2 + xs * 0.1
        df = spark.createDataFrame(
            [Row(x=float(x), y=float(y), z=float(z)) for x, y, z in zip(xs, ys, zs)]
        )
        glob = _mat(_linear_grid(df, spec, float("inf"), -1.0, "x", "y", "z"), spec)
        # force the distributed path; default halo (8 x mean spacing)
        dist = _mat(
            _linear_grid(df, spec, float("inf"), -1.0, "x", "y", "z", max_driver_points=10),
            spec,
        )
        np.testing.assert_allclose(dist, glob, rtol=1e-9, atol=1e-9)
        # a whole-extent halo degenerates to the global triangulation
        full = _mat(
            _linear_grid(df, spec, float("inf"), -1.0, "x", "y", "z", max_driver_points=10, halo=32.0),
            spec,
        )
        np.testing.assert_allclose(full, glob, rtol=1e-12)

    def test_outside_hull_nodata_vs_nearest(self, spark):
        from pyspark.sql import Row

        from gdal_spark.operators.grid import grid_points

        # tight cluster in one corner: most cells outside the hull
        pts = [Row(x=1.0, y=1.0, z=10.0), Row(x=2.0, y=1.0, z=20.0), Row(x=1.0, y=2.0, z=30.0)]
        df = spark.createDataFrame(pts)
        g0 = _mat(grid_points(df, SPEC8, algo="linear", radius=0, nodata=-1), SPEC8)
        assert (g0 == -1).sum() > 40  # most cells nodata
        ginf = _mat(grid_points(df, SPEC8, algo="linear", radius=float("inf"), nodata=-1), SPEC8)
        assert (ginf == -1).sum() == 0  # nearest fallback everywhere
        assert set(np.unique(ginf)) <= {10.0, 20.0, 30.0} | set(np.unique(g0[g0 != -1]))


class TestExactSeamSampling:
    """interpolate_at_points(exact_seams=True): bit-identical to
    sampling the whole assembled raster, including within 0.5 px of
    interior tile seams (the default path's documented deviation)."""

    def _spec8(self):
        from gdal_spark.fixtures import BYTE20_SPEC
        from gdal_spark.operators.raster import RasterSpec

        return RasterSpec(
            width=20, height=20, gt=BYTE20_SPEC.gt, dtype="uint8", nbands=1, tile_size=8
        )

    def _points(self):
        # seam-hugging (within 0.5 px of px/py = 8, 16) + interior +
        # raster-border points
        pxs = [7.6, 7.9, 8.1, 8.4, 15.7, 16.3, 2.3, 11.5, 0.2, 19.8]
        pys = [8.2, 15.9, 7.7, 16.45, 8.0, 15.6, 3.1, 12.8, 0.3, 19.7]
        return [(i, x, y) for i, (x, y) in enumerate(zip(pxs, pys))]

    def test_matches_whole_raster_bilinear(self, spark):
        import numpy as np
        from pyspark.sql import Row

        from gdal_spark.fixtures import BYTE20, byte20_tiles
        from gdal_spark.operators.grid import interpolate_at_points
        from gdal_spark.operators.tiles import warp_bilinear

        spec = self._spec8()
        tiles = byte20_tiles(spark, spec)
        pts = self._points()
        g0, g1, _, g3, _, g5 = spec.gt
        p = spark.createDataFrame(
            [Row(pid=i, x=g0 + px * g1, y=g3 + py * g5) for i, px, py in pts]
        )
        got = {
            r["pid"]: r["value"]
            for r in interpolate_at_points(
                tiles, spec, p, method="bilinear", exact_seams=True
            ).collect()
        }
        sx = np.array([px for _, px, _ in pts])
        sy = np.array([py for _, _, py in pts])
        want, _ = warp_bilinear(BYTE20.astype(np.float64), sx, sy)
        assert len(got) == len(pts)
        for i in range(len(pts)):
            assert got[i] == want[i], (i, got[i], want[i])

    def test_default_path_deviates_at_seams(self, spark):
        """Sanity: the documented deviation is real — the default path
        differs from the global answer for at least one seam point."""
        import numpy as np
        from pyspark.sql import Row

        from gdal_spark.fixtures import BYTE20, byte20_tiles
        from gdal_spark.operators.grid import interpolate_at_points
        from gdal_spark.operators.tiles import warp_bilinear

        spec = self._spec8()
        tiles = byte20_tiles(spark, spec)
        pts = self._points()
        g0, g1, _, g3, _, g5 = spec.gt
        p = spark.createDataFrame(
            [Row(pid=i, x=g0 + px * g1, y=g3 + py * g5) for i, px, py in pts]
        )
        got = {
            r["pid"]: r["value"]
            for r in interpolate_at_points(tiles, spec, p, method="bilinear").collect()
        }
        sx = np.array([px for _, px, _ in pts])
        sy = np.array([py for _, _, py in pts])
        want, _ = warp_bilinear(BYTE20.astype(np.float64), sx, sy)
        assert any(got[i] != want[i] for i in range(len(pts)))

    def test_nearest_exact_seams(self, spark):
        import numpy as np
        from pyspark.sql import Row

        from gdal_spark.fixtures import BYTE20, byte20_tiles
        from gdal_spark.operators.grid import interpolate_at_points
        from gdal_spark.operators.tiles import warp_nearest

        spec = self._spec8()
        tiles = byte20_tiles(spark, spec)
        pts = self._points()
        g0, g1, _, g3, _, g5 = spec.gt
        p = spark.createDataFrame(
            [Row(pid=i, x=g0 + px * g1, y=g3 + py * g5) for i, px, py in pts]
        )
        got = {
            r["pid"]: r["value"]
            for r in interpolate_at_points(
                tiles, spec, p, method="nearest", exact_seams=True
            ).collect()
        }
        sx = np.array([px for _, px, _ in pts])
        sy = np.array([py for _, _, py in pts])
        want, _ = warp_nearest(BYTE20.astype(np.float64), sx, sy)
        for i in range(len(pts)):
            assert got[i] == want[i], (i, got[i], want[i])
