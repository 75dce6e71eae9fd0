"""Polygonize tests: F5 fixture oracles + distributed 2-phase merge."""

from __future__ import annotations

from dataclasses import replace

import numpy as np
import pytest

from gdal_spark.fixtures import (
    POLYGONIZE_156_WKT,
    POLYGONIZE_EXPECTED_DNS,
    POLYGONIZE_GRID,
    POLYGONIZE_NODATA,
    POLYGONIZE_SPEC,
)
from gdal_spark.operators.polygonize import label_components, polygonize, polygonize_array, trace_rings


def _norm(w: str) -> str:
    return w.replace(", ", ",")


class TestLocal:
    def test_f5_reference_oracle(self):
        """autotest/alg/polygonize.py:30-66 — exactly 13 features, this
        DN emission order, and the exact ring+hole WKT of DN=156."""
        out = polygonize_array(POLYGONIZE_GRID, POLYGONIZE_SPEC, nodata=POLYGONIZE_NODATA)
        assert len(out) == 13
        assert [int(d["dn"]) for d in out] == POLYGONIZE_EXPECTED_DNS
        w156 = [d["wkt"] for d in out if d["dn"] == 156][0]
        assert _norm(w156) == _norm(POLYGONIZE_156_WKT)

    def test_labeling_4_vs_8(self):
        arr = np.array([[1, 0], [0, 1]])
        mask = np.ones((2, 2), dtype=bool)
        l4 = label_components(arr, mask, 4)
        l8 = label_components(arr, mask, 8)
        assert l4[0, 0] != l4[1, 1]  # diagonal split in 4-conn
        assert l8[0, 0] == l8[1, 1]  # merged in 8-conn

    def test_pinch_corner_rings_simple(self):
        # two cells of a single 4-conn component meeting diagonally
        # around a shared corner via a connecting path
        cells = {(0, 0), (1, 1), (1, 0)}
        rings = trace_rings(cells)
        assert len(rings) == 1
        r = rings[0]
        assert r[0] == r[-1] and len(set(r[:-1])) == len(r) - 1  # simple


@pytest.mark.usefixtures("spark")
class TestDistributed:
    def test_cross_tile_merge_exact(self, spark):
        """F5 cross-tile invariant: split the grid into 4-px tiles
        (cuts rows 3/4 and cols 3/4); the distributed merge must
        reproduce the identical 13 polygons in order."""
        spec = replace(POLYGONIZE_SPEC, tile_size=4)
        rows = []
        for ty in range(spec.ntiles_y):
            for tx in range(spec.ntiles_x):
                h, w = spec.tile_shape(ty, tx)
                oy, ox = ty * 4, tx * 4
                rows.append(
                    (1, ty, tx, h, w, "int32", bytes(POLYGONIZE_GRID[oy : oy + h, ox : ox + w].tobytes()))
                )
        tiles = spark.createDataFrame(
            rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary"
        )
        got = polygonize(tiles, spec, nodata=POLYGONIZE_NODATA).orderBy("last_row", "first_col").collect()
        local = polygonize_array(POLYGONIZE_GRID, POLYGONIZE_SPEC, nodata=POLYGONIZE_NODATA)
        assert [(r.wkt, int(r.dn)) for r in got] == [(d["wkt"], int(d["dn"])) for d in local]

    def test_8conn_distributed(self, spark):
        spec = replace(POLYGONIZE_SPEC, tile_size=4)
        rows = []
        for ty in range(spec.ntiles_y):
            for tx in range(spec.ntiles_x):
                h, w = spec.tile_shape(ty, tx)
                rows.append(
                    (1, ty, tx, h, w, "int32",
                     bytes(POLYGONIZE_GRID[ty * 4 : ty * 4 + h, tx * 4 : tx * 4 + w].tobytes()))
                )
        tiles = spark.createDataFrame(
            rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary"
        )
        got = polygonize(tiles, spec, nodata=POLYGONIZE_NODATA, connect=8).collect()
        local = polygonize_array(POLYGONIZE_GRID, POLYGONIZE_SPEC, nodata=POLYGONIZE_NODATA, connect=8)
        assert sorted((r.wkt, r.dn) for r in got) == sorted((d["wkt"], d["dn"]) for d in local)


class TestFootprint:
    def test_footprint_outlines_valid_area(self, spark):
        """gdal_footprint: polygonize of the validity mask."""
        import numpy as np

        from gdal_spark.operators.polygonize import footprint
        from gdal_spark.operators.raster import RasterSpec

        arr = np.zeros((8, 8), dtype=np.uint8)
        arr[2:6, 1:5] = 7  # one solid valid rectangle
        spec = RasterSpec(width=8, height=8, gt=(0.0, 1.0, 0.0, 8.0, 0.0, -1.0), tile_size=4)
        tiles = spark.createDataFrame(
            [
                (1, ty, tx, 4, 4, "uint8", arr[ty * 4 : ty * 4 + 4, tx * 4 : tx * 4 + 4].tobytes())
                for ty in range(2)
                for tx in range(2)
            ],
            "band int, ty int, tx int, h int, w int, dtype string, payload binary",
        )
        out = footprint(tiles, spec, nodata=0.0).collect()
        assert len(out) == 1
        assert out[0].dn == 1.0
        # envelope of the footprint polygon == the valid rect in world
        from gdal_spark.geom.wkt import parse_wkt

        env = parse_wkt([out[0].wkt]).envelopes()[0]
        assert tuple(env) == (1.0, 2.0, 5.0, 6.0)
