"""gdal raster edit / gdal vector edit — metadata-plane editing.

Reference: apps/gdalalg_raster_edit.cpp (RunStep :322-871, ParseGCPs
:240-319), apps/gdalalg_vector_edit.cpp (:161-339).
"""

import pytest

from gdal_spark.operators.edit import (
    parse_gcps,
    raster_edit,
    raster_edit_stats,
    read_aux,
    vector_edit,
    write_aux,
)
from gdal_spark.operators.raster import RasterSpec

SPEC3 = RasterSpec(width=40, height=20, gt=(0, 1, 0, 20, 0, -1),
                   dtype="uint8", nbands=3)


class TestRasterEdit:
    def test_bbox_sets_geotransform(self):
        spec, aux = raster_edit(SPEC3, bbox=[10.0, -5.0, 50.0, 15.0])
        # gt = (xmin, (xmax-xmin)/W, 0, ymax, 0, -(ymax-ymin)/H)  :404-410
        assert spec.gt == (10.0, 1.0, 0.0, 15.0, 0.0, -1.0)
        assert spec.width == 40 and spec.height == 20
        assert aux == {}

    def test_bbox_zero_size_errors(self):
        z = RasterSpec(width=0, height=20, gt=(0, 1, 0, 0, 0, -1))
        with pytest.raises(ValueError, match="height or width is null"):
            raster_edit(z, bbox=[0, 0, 1, 1])

    def test_crs_set_and_unset(self):
        _, aux = raster_edit(SPEC3, crs="EPSG:32633")
        assert aux["crs"] == "EPSG:32633"
        _, aux = raster_edit(SPEC3, aux=aux, crs="none")
        assert aux["crs"] is None

    def test_nodata_set_and_none(self):
        _, aux = raster_edit(SPEC3, nodata=255)
        assert aux["nodata"] == 255.0
        _, aux = raster_edit(SPEC3, aux=aux, nodata="none")
        assert "nodata" not in aux

    def test_color_interp_syntaxes(self):
        _, aux = raster_edit(SPEC3, color_interp=["red", "green", "blue"])
        assert aux["color_interp"] == {"1": "Red", "2": "Green", "3": "Blue"}
        _, aux = raster_edit(SPEC3, color_interp=["all=gray"])
        assert aux["color_interp"] == {"1": "Gray", "2": "Gray", "3": "Gray"}
        _, aux = raster_edit(SPEC3, color_interp=["2=alpha", "3=undefined"])
        assert aux["color_interp"] == {"2": "Alpha", "3": "Undefined"}
        # reference quirk :556-565 — a single <band>=<color> token on a
        # multiband dataset errors (only all= escapes the guard)
        with pytest.raises(ValueError, match="With several bands"):
            raster_edit(SPEC3, color_interp=["2=alpha"])
        one = RasterSpec(width=4, height=4, gt=(0, 1, 0, 4, 0, -1), nbands=1)
        _, aux = raster_edit(one, color_interp=["palette"])
        assert aux["color_interp"] == {"1": "Palette"}
        _, aux = raster_edit(SPEC3, color_interp=["undefined", "nir", "swir"])
        assert aux["color_interp"]["2"] == "NIR"

    def test_color_interp_errors(self):
        # one bare value with several bands  :556-565
        with pytest.raises(ValueError, match="With several bands"):
            raster_edit(SPEC3, color_interp=["red"])
        with pytest.raises(ValueError, match="Unsupported color interpretation"):
            raster_edit(SPEC3, color_interp=["all=chartreuse"])
        with pytest.raises(ValueError, match="Invalid band number '4'"):
            raster_edit(SPEC3, color_interp=["4=red", "1=green"])
        with pytest.raises(ValueError, match="Mix of different syntaxes"):
            raster_edit(SPEC3, color_interp=["1=red", "green", "blue"])
        with pytest.raises(ValueError, match="More color interpretation values"):
            raster_edit(SPEC3, color_interp=["red", "green", "blue", "alpha"])
        with pytest.raises(ValueError, match="Less color interpretation values"):
            raster_edit(SPEC3, color_interp=["red", "green"])

    def test_scale_offset_rules(self):
        # single bare value applies to every band  :663-672
        _, aux = raster_edit(SPEC3, scale="2.5")
        assert aux["scale"] == {"1": 2.5, "2": 2.5, "3": 2.5}
        _, aux = raster_edit(SPEC3, scale=["1=2", "3=4"], offset=["10", "20", "30"])
        assert aux["scale"] == {"1": 2.0, "3": 4.0}
        assert aux["offset"] == {"1": 10.0, "2": 20.0, "3": 30.0}
        with pytest.raises(ValueError, match="Less offset values"):
            raster_edit(SPEC3, offset=["10", "20"])
        with pytest.raises(ValueError, match="Mix of different syntaxes to specify scale"):
            raster_edit(SPEC3, scale=["1=2", "3"])

    def test_metadata_set_unset_domain(self):
        _, aux = raster_edit(SPEC3, metadata={"A": "1", "B": "2"})
        _, aux = raster_edit(SPEC3, aux=aux, unset_metadata=["A", "ghost"])
        assert aux["metadata"][""] == {"B": "2"}
        _, aux = raster_edit(SPEC3, aux=aux, unset_metadata_domain=[""])
        assert aux["metadata"] == {}

    def test_gcps_inline_and_crs_attaches(self):
        _, aux = raster_edit(
            SPEC3, crs="EPSG:4326",
            gcps=["0,0,100,200", "10,5,110,195,7.5"],
        )
        assert "crs" not in aux  # CRS goes to the GCPs, not the dataset :796
        assert aux["gcp_crs"] == "EPSG:4326"
        assert aux["gcps"][1] == {
            "id": "", "info": "", "pixel": 10.0, "line": 5.0,
            "x": 110.0, "y": 195.0, "z": 7.5,
        }

    def test_gcps_bad_tuple(self):
        with pytest.raises(ValueError, match="Bad value for gcp"):
            raster_edit(SPEC3, gcps=["1,2,3"])

    def test_edit_chain_preserves_other_aux(self):
        _, aux = raster_edit(SPEC3, nodata=9, metadata={"K": "V"})
        spec, aux2 = raster_edit(SPEC3, aux=aux, crs="EPSG:3857")
        assert aux2["nodata"] == 9.0 and aux2["metadata"][""] == {"K": "V"}
        assert aux == {"nodata": 9.0, "metadata": {"": {"K": "V"}}}  # input not mutated


class TestGcpLayer:
    def test_layer_fields(self, spark):
        lyr = spark.createDataFrame(
            [(1, "a", 0.0, 0.0, 10.0, 20.0, None), (2, None, 5.0, 4.0, 11.0, 19.0, 3.0)],
            "id int, info string, column double, line double, x double, y double, z double",
        )
        g = parse_gcps(gcp_layer=lyr)
        assert g[0]["id"] == "1" and g[0]["info"] == "a" and g[0]["z"] == 0.0
        assert g[1]["info"] == "" and g[1]["z"] == 3.0

    def test_layer_missing_required(self, spark):
        lyr = spark.createDataFrame([(0.0, 0.0, 1.0)], "column double, line double, x double")
        with pytest.raises(ValueError, match="Field 'y' cannot be found"):
            parse_gcps(gcp_layer=lyr)


class TestVectorEdit:
    def test_metadata_and_rename(self, spark):
        df = spark.range(3).selectExpr("id AS fid", "id * 2 AS v")
        out, aux = vector_edit(
            df, layer_name="renamed", crs="EPSG:4326",
            metadata={"D": "1"}, layer_metadata={"L": "2"},
        )
        assert aux == {
            "layer_name": "renamed", "crs": "EPSG:4326",
            "metadata": {"D": "1"}, "layer_metadata": {"L": "2"},
        }
        assert out.columns == ["fid", "v"]  # no unset_fid: untouched
        out2, aux2 = vector_edit(out, aux=aux, unset_layer_metadata=["L"],
                                 unset_fid=True)
        assert aux2["layer_metadata"] == {}
        assert out2.columns == ["v"]

    def test_geometry_type_declared_only(self, spark):
        df = spark.createDataFrame([("POINT (1 2)",)], "wkt string")
        out, aux = vector_edit(df, geometry_type="MULTIPOINT")
        assert aux["geometry_type"] == "MULTIPOINT"
        # feature geometries are NOT converted (that is set-geom-type)
        assert out.first().wkt == "POINT (1 2)"


class TestAuxSidecarAndStats:
    def test_aux_roundtrip_and_dataset_copy_carries_it(self, tmp_path):
        from gdal_spark.operators.fsops import dataset_copy

        p = tmp_path / "ds.bin"
        p.write_bytes(b"x")
        write_aux(str(p), {"crs": "EPSG:4326", "nodata": 3.0})
        assert read_aux(str(p)) == {"crs": "EPSG:4326", "nodata": 3.0}
        dataset_copy(str(p), str(tmp_path / "copy.bin"))
        assert read_aux(str(tmp_path / "copy.bin")) == {"crs": "EPSG:4326", "nodata": 3.0}

    def test_stats_and_hist(self, spark):
        import numpy as np

        from gdal_spark.operators.raster import TILE_SCHEMA

        spec = RasterSpec(width=8, height=4, gt=(0, 1, 0, 4, 0, -1),
                          dtype="uint8", nbands=1, tile_size=8)
        pay = np.arange(32, dtype=np.uint8).tobytes()
        tiles = spark.createDataFrame([(1, 0, 0, 4, 8, "uint8", pay)], TILE_SCHEMA)
        stats, hist = raster_edit_stats(tiles, spec, hist=True)
        s = stats.first()
        assert (s.min, s.max) == (0.0, 31.0)
        h = {r.bucket: r["count"] for r in hist.filter("count > 0").collect()}
        assert sum(h.values()) == 32 and h[0] == 1
