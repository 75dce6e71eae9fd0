"""`gdal mdim info` (apps/gdalalg_mdim_info.cpp; JSON shape
gdalmdiminfo_lib.cpp DumpGroup/DumpArray)."""

import numpy as np
import pytest

from gdal_spark.operators.multidim import MDArraySpec, from_numpy, mdim_info


@pytest.fixture(scope="module")
def group(spark):
    t_spec = MDArraySpec(
        name="temp", dims=(("time", 4), ("y", 6), ("x", 8)),
        chunks=(2, 3, 4), dtype="float32",
        attrs={"unit": "K", "nodata": -999.0, "long_name": "temperature"},
    )
    t_arr = np.arange(4 * 6 * 8, dtype=np.float32).reshape(4, 6, 8)
    p_spec = MDArraySpec(
        name="precip", dims=(("time", 4), ("y", 6), ("x", 8)),
        chunks=(4, 6, 8), dtype="float64",
        attrs={"scale": 0.1, "offset": 2.0},
    )
    p_arr = np.ones((4, 6, 8))
    return {
        "temp": (t_spec, from_numpy(spark, t_arr, t_spec)),
        "precip": (p_spec, from_numpy(spark, p_arr, p_spec)),
    }, t_arr


class TestMdimInfo:
    def test_group_shape(self, group):
        arrays, _ = group
        out = mdim_info(arrays, driver="MEM", group_attrs={"title": "demo"})
        assert out["type"] == "group" and out["driver"] == "MEM"
        assert out["name"] == "/"
        assert out["attributes"] == {"title": "demo"}
        # group-level dims: union, first-seen order, full records
        assert [d["name"] for d in out["dimensions"]] == ["time", "y", "x"]
        assert out["dimensions"][0] == {"name": "time", "full_name": "/time",
                                        "size": 4}
        assert sorted(out["arrays"]) == ["precip", "temp"]

    def test_array_record(self, group):
        arrays, _ = group
        out = mdim_info(arrays)
        t = out["arrays"]["temp"]
        assert t["full_name"] == "/temp"
        assert t["datatype"] == "Float32"
        # dims already dumped at group level -> collapse to "/name"
        # strings (DumpDimensions alreadyDumpedDimensions)
        assert t["dimensions"] == ["/time", "/y", "/x"]
        assert t["dimension_size"] == [4, 6, 8]
        assert t["block_size"] == [2, 3, 4]
        # reserved attrs surface as dedicated keys
        assert t["unit"] == "K" and t["nodata_value"] == -999.0
        assert t["attributes"] == {"long_name": "temperature"}
        assert "unit" not in t["attributes"]
        p = out["arrays"]["precip"]
        assert p["datatype"] == "Float64"
        assert p["offset"] == 2.0 and p["scale"] == 0.1

    def test_summary(self, group):
        arrays, _ = group
        out = mdim_info(arrays, driver="MEM", summary=True)
        assert "dimensions" not in out and "attributes" not in out
        assert out["arrays"]["temp"] == {"full_name": "/temp"}

    def test_single_array(self, group):
        arrays, _ = group
        out = mdim_info(arrays, array="temp")
        assert out["type"] == "array" and out["name"] == "temp"
        # standalone dump: dimensions expand fully (fresh dumped set)
        assert out["dimensions"][0]["name"] == "time"
        with pytest.raises(ValueError, match="Cannot find array"):
            mdim_info(arrays, array="nope")

    def test_stats_and_values(self, group):
        arrays, t_arr = group
        out = mdim_info(arrays, array="temp", stats=True, detailed=True)
        st = out["statistics"]
        assert st["min"] == 0.0 and st["max"] == float(t_arr.max())
        assert abs(st["mean"] - t_arr.mean()) < 1e-9
        assert np.array_equal(np.asarray(out["values"], dtype=np.float32), t_arr)
