"""gdal2xyz: srcwin/skip/nodata semantics vs a literal replica."""

from __future__ import annotations

import numpy as np

from gdal_spark.operators.raster import RasterSpec, gdal2xyz


def _tiles(spark, arr3, spec):
    ts = spec.tile_size
    rows = []
    for b in range(arr3.shape[0]):
        for ty in range(spec.ntiles_y):
            for tx in range(spec.ntiles_x):
                h, w = spec.tile_shape(ty, tx)
                rows.append((b + 1, ty, tx, h, w, str(arr3.dtype),
                             arr3[b, ty * ts : ty * ts + h, tx * ts : tx * ts + w].tobytes()))
    return spark.createDataFrame(
        rows, "band int, ty int, tx int, h int, w int, dtype string, payload binary"
    )


def _replica(arr3, spec, srcwin, skip, src_nodata, skip_nodata, dst_nodata):
    g0, g1, g2, g3, g4, g5 = spec.gt
    x_off, y_off, x_size, y_size = srcwin or (0, 0, spec.width, spec.height)
    out = []
    sn = None if src_nodata is None else np.asarray(src_nodata, float)
    dn = None if dst_nodata is None else np.asarray(dst_nodata, float)
    do_skip = skip_nodata and sn is not None
    do_replace = (not do_skip) and dn is not None and sn is not None
    for y in range(y_off, y_off + y_size, skip[1]):
        for x_i in range(0, x_size, skip[0]):
            x = x_i + x_off
            v = arr3[:, y, x].astype(float)
            if sn is not None and np.array_equal(sn, v):
                if do_skip:
                    continue
                if do_replace:
                    v = dn
            out.append((g0 + (x + 0.5) * g1 + (y + 0.5) * g2,
                        g3 + (x + 0.5) * g4 + (y + 0.5) * g5, *v))
    return sorted(out)


class TestGdal2XYZ:
    def test_multiband_replace(self, spark):
        rng = np.random.default_rng(11)
        arr = rng.integers(0, 4, size=(2, 13, 15), dtype=np.uint8)
        spec = RasterSpec(width=15, height=13, gt=(100.0, 2.0, 0.0, 50.0, 0.0, -2.0),
                          dtype="uint8", nbands=2, tile_size=5)
        got = gdal2xyz(_tiles(spark, arr, spec), spec,
                       srcwin=(1, 2, 12, 10), skip=(3, 2),
                       src_nodata=[0.0, 0.0], dst_nodata=[9.0, 8.0])
        rows = sorted((r.geo_x, r.geo_y, r.b1, r.b2) for r in got.collect())
        want = _replica(arr, spec, (1, 2, 12, 10), (3, 2), [0.0, 0.0], False, [9.0, 8.0])
        assert rows == want
        # vector-nodata rule: a pixel with (0, nonzero) is NOT nodata
        mixed = [(x, y, b1, b2) for x, y, b1, b2 in rows if b1 == 0 and b2 not in (0, 8)]
        all_nd = [(x, y, b1, b2) for x, y, b1, b2 in rows if (b1, b2) == (9.0, 8.0)]
        assert mixed or all_nd  # the rng grid exercises at least one case

    def test_skip_nodata_single_band(self, spark):
        arr = np.zeros((1, 6, 6), dtype=np.uint8)
        arr[0, 2, 3] = 5
        spec = RasterSpec(width=6, height=6, gt=(0.0, 1.0, 0.0, 6.0, 0.0, -1.0),
                          dtype="uint8", nbands=1, tile_size=4)
        got = gdal2xyz(_tiles(spark, arr, spec), spec, src_nodata=[0.0], skip_nodata=True)
        rows = [(r.geo_x, r.geo_y, r.b1) for r in got.collect()]
        assert rows == [(3.5, 3.5, 5.0)]
