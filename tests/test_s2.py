"""True S2 cell index tests (geom/s2.py + the cells.py Spark surface).

The construction is the canonical public S2 algorithm (cube face ->
quadratic ST -> Hilbert quadtree; s2geometry s2coords.h/s2cell_id.cc
semantics).  Structural invariants pin the automaton; the Spark tests
pin the Catalyst bit-arithmetic helpers against the numpy kernel,
including the negative int64 ids of faces 4/5; the driver oracle
`s2_cells` replays the whole encode bit-exactly in DuckDB SQL."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.geom import s2


def _rand_units(n, seed=7):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


class TestKernel:
    def test_level0_face_tokens(self):
        # the six face cells are the documented anchor ids
        ctrs = np.array(
            [[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [0, -1, 0], [0, 0, -1]],
            dtype=float,
        )
        ids = s2.cell_from_xyz(ctrs[:, 0], ctrs[:, 1], ctrs[:, 2], level=0)
        assert list(s2.token(ids)) == ["1", "3", "5", "7", "9", "b"]
        assert (s2.level_of(ids) == 0).all()

    def test_center_roundtrip_level30(self):
        v = _rand_units(5000)
        c = s2.cell_from_xyz(v[:, 0], v[:, 1], v[:, 2])
        assert (s2.level_of(c) == 30).all()
        x, y, z = s2.cell_center_xyz(c)
        assert (s2.cell_from_xyz(x, y, z) == c).all()

    def test_center_roundtrip_coarser_levels(self):
        v = _rand_units(500, seed=11)
        full = s2.cell_from_xyz(v[:, 0], v[:, 1], v[:, 2])
        for lvl in (3, 12, 21):
            p = s2.parent(full, lvl)
            x, y, z = s2.cell_center_xyz(p)
            again = s2.cell_from_xyz(x, y, z, level=lvl)
            assert (again == p).all()

    def test_parent_contains_descendants(self):
        v = _rand_units(2000, seed=3)
        c = s2.cell_from_xyz(v[:, 0], v[:, 1], v[:, 2])
        for lvl in (0, 7, 15, 29):
            p = s2.parent(c, lvl)
            assert (s2.level_of(p) == lvl).all()
            assert s2.contains(p, c).all()
        # a cell does NOT contain a different face-0 anchor
        face0 = np.full_like(c, 0x1000000000000000)
        other = s2.parent(c, 0) != face0
        assert (~s2.contains(face0, c) == other).all()

    def test_ranges_nest_and_partition(self):
        # children ranges tile the parent range exactly
        v = _rand_units(300, seed=5)
        c12 = s2.parent(s2.cell_from_xyz(v[:, 0], v[:, 1], v[:, 2]), 12)
        lsb = s2.lsb_for_level(12)
        child_lsb = s2.lsb_for_level(13)
        base = s2.range_min(c12) - 1  # min leaf id ends ...01; zero the level marker
        for k in range(4):
            child = base + np.int64(2 * k * child_lsb + child_lsb)
            assert (s2.level_of(child) == 13).all()
            assert s2.contains(c12, child).all()
        # [min_leaf, max_leaf] spans 2*lsb - 1 ids (odd leaf ids step by 2)
        assert (s2.range_max(c12) - s2.range_min(c12) == 2 * (lsb - 1)).all()

    @pytest.mark.parametrize("face", [0, 1, 2, 3, 4, 5])
    def test_hilbert_continuity_and_coverage(self, face):
        # all 256 level-4 cells of the face, in id order: consecutive
        # cells must be edge-adjacent (Hilbert property) and cover the
        # 16x16 grid exactly once
        lev = 4
        anchor = np.array((2 * face + 1) << 60, dtype=np.uint64).view(np.int64)
        first = s2.parent(np.array([int(s2.range_min(anchor))]), lev)[0]
        step = 2 * s2.lsb_for_level(lev)
        n = 1 << lev
        ids = np.arange(first, first + step * n * n, step, dtype=np.int64)
        assert (s2.level_of(ids) == lev).all()
        f, i, j, _ = s2.to_face_ij(ids)
        assert (f == face).all()
        cs = 1 << (30 - lev)
        assert ((np.abs(np.diff(i)) + np.abs(np.diff(j))) == cs).all()
        assert len(set(zip((i // cs).tolist(), (j // cs).tolist()))) == n * n

    def test_st_uv_inverse(self):
        s = np.linspace(0.0, 1.0, 1001)
        assert np.allclose(s2.uv_to_st(s2.st_to_uv(s)), s, atol=1e-12)
        u = np.linspace(-1.0, 1.0, 1001)
        assert np.allclose(s2.st_to_uv(s2.uv_to_st(u)), u, atol=1e-12)

    def test_lonlat_entry(self):
        lon = np.array([0.0, 90.0, 180.0, -90.0, 10.0, 10.0])
        lat = np.array([0.0, 0.0, 0.0, 0.0, 89.9, -89.9])
        f, _, _, _ = s2.to_face_ij(s2.cell_from_lonlat(lon, lat))
        assert list(f) == [0, 1, 3, 4, 2, 5]
        # geodetic and xyz entries agree
        rad = np.radians
        x = np.cos(rad(lat)) * np.cos(rad(lon))
        y = np.cos(rad(lat)) * np.sin(rad(lon))
        z = np.sin(rad(lat))
        assert (s2.cell_from_lonlat(lon, lat) == s2.cell_from_xyz(x, y, z)).all()

    def test_face_uv_roundtrip(self):
        v = _rand_units(1000, seed=13)
        face, u, vv = s2.xyz_to_face_uv(v[:, 0], v[:, 1], v[:, 2])
        assert ((u >= -1 - 1e-12) & (u <= 1 + 1e-12)).all()
        x, y, z = s2.face_uv_to_xyz(face, u, vv)
        n = np.sqrt(x * x + y * y + z * z)
        dot = (x * v[:, 0] + y * v[:, 1] + z * v[:, 2]) / n
        assert np.allclose(dot, 1.0, atol=1e-12)


class TestSparkSurface:
    def test_catalyst_helpers_match_kernel(self, spark):
        from gdal_spark.operators.cells import s2_parent_col, s2_range_cols, s2_token_col

        v = _rand_units(600, seed=17)
        cells = s2.cell_from_xyz(v[:, 0], v[:, 1], v[:, 2])
        # make sure the negative face-4/5 ids are represented
        assert (cells < 0).any() and (cells > 0).any()
        df = spark.createDataFrame([(int(c),) for c in cells], "cell long")
        rmin, rmax = s2_range_cols(F.col("cell"))
        out = df.select(
            "cell",
            s2_parent_col(F.col("cell"), 9).alias("p9"),
            s2_token_col(F.col("cell")).alias("tok"),
            rmin.alias("rmin"),
            rmax.alias("rmax"),
        ).toPandas()
        got = out.sort_values("cell").reset_index(drop=True)
        order = np.argsort(cells)
        assert (got["p9"].to_numpy(np.int64) == s2.parent(cells, 9)[order]).all()
        assert (got["tok"].to_numpy(object) == s2.token(cells)[order]).all()
        assert (got["rmin"].to_numpy(np.int64) == s2.range_min(cells)[order]).all()
        assert (got["rmax"].to_numpy(np.int64) == s2.range_max(cells)[order]).all()

    def test_encoder_udf_and_prefix_repartition(self, spark):
        from gdal_spark.operators.cells import repartition_by_s2_prefix, s2_cell_udf, s2_parent_col

        v = _rand_units(400, seed=19)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in v], "x double, y double, z double"
        )
        enc = s2_cell_udf(level=30)
        cells_df = df.select(enc("x", "y", "z").alias("cell"))
        got = np.sort(np.array([r.cell for r in cells_df.collect()], dtype=np.int64))
        want = np.sort(s2.cell_from_xyz(v[:, 0], v[:, 1], v[:, 2]))
        assert (got == want).all()
        # prefix repartition: every partition holds full level-2 cells
        parts = (
            repartition_by_s2_prefix(cells_df, "cell", level=2, num_partitions=8)
            .withColumn("pid", F.spark_partition_id())
            .select(s2_parent_col(F.col("cell"), 2).alias("p2"), "pid")
            .distinct()
            .groupBy("p2")
            .count()
            .collect()
        )
        assert parts and all(r["count"] == 1 for r in parts)

    def test_lonlat_udf(self, spark):
        from gdal_spark.operators.cells import s2_cell_udf

        df = spark.createDataFrame([(0.0, 0.0), (90.0, 0.0), (10.0, 89.9)], "lon double, lat double")
        enc = s2_cell_udf(level=12, from_lonlat=True)
        got = np.array([r.c for r in df.select(enc("lon", "lat").alias("c")).collect()], dtype=np.int64)
        want = s2.cell_from_lonlat(np.array([0.0, 90.0, 10.0]), np.array([0.0, 0.0, 89.9]), level=12)
        assert (np.sort(got) == np.sort(want)).all()


class TestPrefixPruning:
    def test_cell_range_filter_pushes_to_parquet_scan(self, spark, tmp_path):
        """The 100-TB contract of the S2 layout: a table written
        repartition_by_s2_prefix'd and filtered by an ancestor's
        [range_min, range_max] must push BOTH range predicates into
        the Parquet scan (row-group min/max skip — the Hilbert sort
        within partitions makes those ranges tight)."""
        from gdal_spark.operators.cells import repartition_by_s2_prefix, s2_range_cols

        v = _rand_units(2000, seed=23)
        cells = s2.cell_from_xyz(v[:, 0], v[:, 1], v[:, 2])
        df = spark.createDataFrame([(int(c),) for c in cells], "cell long")
        path = str(tmp_path / "s2_layout")
        repartition_by_s2_prefix(df, "cell", level=2, num_partitions=4).write.parquet(path)

        table = spark.read.parquet(path)
        # pick a level-4 ancestor that exists in the data
        anchor = int(s2.parent(cells[:1], 4)[0])
        rmin, rmax = s2_range_cols(F.lit(anchor))
        q = table.filter(F.col("cell").between(rmin, rmax))
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan
        pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
        assert "GreaterThanOrEqual(cell" in pushed and "LessThanOrEqual(cell" in pushed
        # and the filter is correct vs the kernel
        got = np.array([r.cell for r in q.collect()], dtype=np.int64)
        want = cells[s2.contains(np.int64(anchor), cells)]
        assert (np.sort(got) == np.sort(want)).all()


class TestCapCover:
    AXIS = np.array([0.3, -0.5, 0.81])
    ANGLE = 0.05

    def _cover(self, max_cells=48):
        cells = s2.cover_cap(self.AXIS, self.ANGLE, max_cells=max_cells)
        return cells, s2.cover_ranges(cells)

    def test_superset_guarantee_and_budget(self):
        cells, ranges = self._cover()
        assert 0 < len(cells) <= 48
        rng = np.random.default_rng(29)
        v = rng.normal(size=(30000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        ax = self.AXIS / np.linalg.norm(self.AXIS)
        ang = np.arccos(np.clip(v @ ax, -1, 1))
        leaf = s2.cell_from_xyz(v[:, 0], v[:, 1], v[:, 2])
        flip = np.int64(-9223372036854775808)
        lu = leaf ^ flip
        covered = np.zeros(len(v), dtype=bool)
        for lo, hi in ranges:
            covered |= (lu >= (np.int64(lo) ^ flip)) & (lu <= (np.int64(hi) ^ flip))
        # no false negatives (every in-cap point is covered) ...
        assert ((ang <= self.ANGLE) & ~covered).sum() == 0
        # ... and the BFS refinement keeps the cover tight
        assert (covered & (ang > 3 * self.ANGLE)).sum() == 0

    def test_ranges_disjoint_sorted(self):
        _, ranges = self._cover()
        assert all(lo <= hi for lo, hi in ranges)
        assert all(ranges[k][1] < ranges[k + 1][0] for k in range(len(ranges) - 1))

    def test_negative_face_cap(self):
        cells = s2.cover_cap(np.array([0.0, -1.0, -0.2]), 0.08, max_cells=32)
        assert cells and all(-(2**63) <= c < 2**63 for c in cells)
        # cap axis on face 4: at least one covering cell is negative
        assert any(c < 0 for c in cells)

    def test_spark_cover_filter_pushes_down(self, spark):
        from gdal_spark.operators.cells import s2_cover_filter

        cells_list, ranges = self._cover()
        rng = np.random.default_rng(31)
        v = rng.normal(size=(4000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        leaf = s2.cell_from_xyz(v[:, 0], v[:, 1], v[:, 2])
        df = spark.createDataFrame([(int(c),) for c in leaf], "cell long")
        q = df.filter(s2_cover_filter(F.col("cell"), ranges))
        got = np.sort(np.array([r.cell for r in q.collect()], dtype=np.int64))
        flip = np.int64(-9223372036854775808)
        lu = leaf ^ flip
        covered = np.zeros(len(v), dtype=bool)
        for lo, hi in ranges:
            covered |= (lu >= (np.int64(lo) ^ flip)) & (lu <= (np.int64(hi) ^ flip))
        assert (got == np.sort(leaf[covered])).all()


def test_degenerate_inputs_do_not_crash():
    # zero vector / NaN / inf must produce VALID deterministic ids
    # (never an undefined float->int cast) — executor-crash hardening
    x = np.array([0.0, np.nan, np.inf, -np.inf])
    y = np.array([0.0, 1.0, 0.0, np.nan])
    z = np.array([0.0, 0.0, np.nan, 0.0])
    with np.errstate(all="ignore"):
        c = s2.cell_from_xyz(x, y, z)
    assert (s2.level_of(c) == 30).all()
    assert ((c % 2) != 0).all()  # trailing marker bit set -> valid ids
