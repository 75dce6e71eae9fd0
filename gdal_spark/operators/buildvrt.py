"""gdalbuildvrt — mosaic PLANNING over a source catalog: target grid
resolution/extent selection plus per-source src/dst windows.

Reference: /root/reference/apps/gdalbuildvrt_lib.cpp:

  * resolution strategies (:1080-1145): `average` = running mean of
    source resolutions, `highest` = min we_res / max ns_res (ns is
    negative), `lowest` = max / min, `same` = error on any mismatch,
    `common` = CPLGreatestCommonDivisor (rational gcd via Stern-Brocot
    fractions, port/cpl_float.cpp:339-473), `user` = -tr values
    (ns negated, :1753-1764).
  * extent: union of source bounding boxes unless -te (:1067-1078);
    -tap snaps min out / max out to the resolution grid (:1895-1900);
    raster size = int(0.5 + extent / res) (:1903-1904).
  * GetSrcDstWin (:117-198): per source, strict-inequality bbox
    rejection against the target extent, fractional src/dst offsets
    (src offset in SOURCE pixels when the source starts before the
    extent, dst offset in TARGET pixels otherwise), sizes scaled by
    src_res/dst_res with tail clamping against the target size.
  * -separate (CreateVRTSeparate :1199+): each kept source becomes its
    own band, numbered in catalog order over the KEPT sources.

Distributed shape: the catalog is a DataFrame (one row per source
raster — at 100 TB that is millions of rows of metadata, not pixels).
The grid selection is ONE tiny aggregate (min/max/avg over five
columns — map-side combined; `common`/`same` collect only the DISTINCT
resolutions, of which real mosaics have a handful); the window
computation is a pure-Catalyst projection over the catalog with the
six grid scalars inlined as literals — no shuffle at all, and the
result can feed the tile-level mosaic/warp operators directly.
`average` note: the reference accumulates a running mean in file
order; sum/count is the same real number but can differ in the last
ulp for adversarial float sequences — we use Spark's avg (documented
deviation, exact for the binary-representable resolutions in tests).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def float_to_fraction(x: float, err: float = 1e-10) -> tuple[int, int] | None:
    """Stern-Brocot / continued-fraction approximation
    (port/cpl_float.cpp:295-337 FloatToFraction)."""
    g = abs(x)
    a, b, c, d = 0, 1, 1, 0
    num = den = 0
    for _ in range(1000):
        if not (0 <= g <= 2**64 - 1):
            break
        s = int(math.floor(g))
        num = a + s * c
        den = b + s * d
        a, b, c, d = c, d, num, den
        rem = g - s
        g = math.inf if rem == 0 else 1.0 / rem
        approx = math.copysign(num / den, x)
        if abs(approx - x) < err:
            return num, den
    return None


def greatest_common_divisor(a: float, b: float) -> float:
    """CPLGreatestCommonDivisor (port/cpl_float.cpp:393-473): 0 on
    failure, like the reference."""
    if a == 0 or b == 0 or not (math.isfinite(a) and math.isfinite(b)):
        return 0.0
    if a == b:
        return a
    if a > b and abs(round(a / b) - a / b) < 1e-8:
        return b
    if b > a and abs(round(b / a) - b / a) < 1e-8:
        return a
    fa = float_to_fraction(a)
    fb = float_to_fraction(b)
    if fa is None or fb is None:
        return 0.0
    sign = -1.0 if a < 0 else 1.0
    common_denom = math.lcm(fa[1], fb[1])
    num_a = fa[0] * round(common_denom / fa[1])
    num_b = fb[0] * round(common_denom / fb[1])
    common_num = math.gcd(int(num_a), int(num_b))
    common = sign * common_num / common_denom
    if max(a / common, b / common) > 10000:
        return 0.0
    return common


@dataclass(frozen=True)
class VRTGrid:
    """The planned target grid."""

    minx: float
    maxy: float
    we_res: float
    ns_res: float  # negative
    xsize: int
    ysize: int

    @property
    def maxx(self) -> float:
        return self.minx + self.xsize * self.we_res

    @property
    def miny(self) -> float:
        return self.maxy + self.ysize * self.ns_res


def build_vrt_plan(
    sources: DataFrame,
    resolution: str = "average",
    we_res: float | None = None,
    ns_res: float | None = None,
    target_aligned_pixels: bool = False,
    extent: tuple[float, float, float, float] | None = None,
    separate: bool = False,
) -> tuple[VRTGrid, DataFrame]:
    """sources: one row per raster with columns (src_id, tlx, tly,
    we_res (>0), ns_res (<0), xsize, ysize). Returns the target grid
    and the per-source window plan: (src_id, [band,] src_xoff,
    src_yoff, src_xsize, src_ysize, dst_xoff, dst_yoff, dst_xsize,
    dst_ysize) — sources that do not intersect the extent are dropped,
    exactly GetSrcDstWin's strict-inequality tests."""
    if resolution == "user":
        if not we_res or not ns_res or we_res <= 0 or ns_res <= 0:
            raise ValueError("user resolution requires positive we_res / ns_res")
        res_we, res_ns = float(we_res), -float(ns_res)
    else:
        agg = [
            F.avg("we_res").alias("avg_we"), F.avg("ns_res").alias("avg_ns"),
            F.min("we_res").alias("min_we"), F.max("we_res").alias("max_we"),
            F.min("ns_res").alias("min_ns"), F.max("ns_res").alias("max_ns"),
            F.count_distinct("we_res", "ns_res").alias("n_res"),
        ]
        m = sources.agg(*agg).collect()[0]
        if resolution == "average":
            res_we, res_ns = float(m["avg_we"]), float(m["avg_ns"])
        elif resolution == "highest":
            res_we, res_ns = float(m["min_we"]), float(m["max_ns"])
        elif resolution == "lowest":
            res_we, res_ns = float(m["max_we"]), float(m["min_ns"])
        elif resolution == "same":
            if int(m["n_res"]) != 1:
                raise ValueError(
                    "sources have heterogeneous resolutions; a different "
                    "resolution strategy should be specified"
                )
            res_we, res_ns = float(m["min_we"]), float(m["min_ns"])
        elif resolution == "common":
            rs = sources.select("we_res", "ns_res").distinct().collect()
            res_we = res_ns = 0.0
            for i, r in enumerate(rs):
                if i == 0:
                    res_we, res_ns = float(r["we_res"]), float(r["ns_res"])
                else:
                    res_we = greatest_common_divisor(res_we, float(r["we_res"]))
                    res_ns = greatest_common_divisor(res_ns, float(r["ns_res"]))
            if res_we == 0 or res_ns == 0:
                raise ValueError("Failed to get common resolution")
        else:
            raise ValueError(f"unknown resolution strategy {resolution!r}")

    if extent is not None:
        minx, miny, maxx, maxy = (float(v) for v in extent)
    else:
        e = sources.agg(
            F.min("tlx").alias("minx"),
            F.max(F.col("tlx") + F.col("xsize") * F.col("we_res")).alias("maxx"),
            F.min(F.col("tly") + F.col("ysize") * F.col("ns_res")).alias("miny"),
            F.max("tly").alias("maxy"),
        ).collect()[0]
        minx, miny, maxx, maxy = (float(e[k]) for k in ("minx", "miny", "maxx", "maxy"))

    if target_aligned_pixels:  # -tap (:1895-1900)
        minx = math.floor(minx / res_we) * res_we
        maxx = math.ceil(maxx / res_we) * res_we
        miny = math.floor(miny / -res_ns) * -res_ns
        maxy = math.ceil(maxy / -res_ns) * -res_ns

    xsize = int(0.5 + (maxx - minx) / res_we)
    ysize = int(0.5 + (maxy - miny) / -res_ns)
    if xsize == 0 or ysize == 0:
        raise ValueError("Computed VRT dimension is null")
    grid = VRTGrid(minx=minx, maxy=maxy, we_res=res_we, ns_res=res_ns, xsize=xsize, ysize=ysize)

    # GetSrcDstWin as a pure-Catalyst projection (:117-198)
    tlx, tly = F.col("tlx"), F.col("tly")
    s_we, s_ns = F.col("we_res"), F.col("ns_res")
    sx, sy = F.col("xsize").cast("double"), F.col("ysize").cast("double")
    L = F.lit
    keep = (
        (tlx + sx * s_we > L(minx))
        & (tlx < L(maxx))
        & (tly + sy * s_ns < L(maxy))
        & (tly > L(miny))
    )
    src_xoff = F.when(tlx < L(minx), (L(minx) - tlx) / s_we).otherwise(L(0.0))
    dst_xoff = F.when(tlx < L(minx), L(0.0)).otherwise((tlx - L(minx)) / L(res_we))
    src_yoff = F.when(L(maxy) < tly, (tly - L(maxy)) / (-s_ns)).otherwise(L(0.0))
    dst_yoff = F.when(L(maxy) < tly, L(0.0)).otherwise((L(maxy) - tly) / L(-res_ns))
    src_xsize = F.when(src_xoff > 0, sx - src_xoff).otherwise(sx)
    src_ysize = F.when(src_yoff > 0, sy - src_yoff).otherwise(sy)
    fx = s_we / L(res_we)
    fy = s_ns / L(res_ns)
    dst_xsize = src_xsize * fx
    dst_ysize = src_ysize * fy
    # clamp the tail against the target size (:185-196)
    over_x = dst_xoff + dst_xsize > L(float(xsize))
    dst_xsize2 = F.when(over_x, L(float(xsize)) - dst_xoff).otherwise(dst_xsize)
    src_xsize2 = F.when(over_x, dst_xsize2 / fx).otherwise(src_xsize)
    over_y = dst_yoff + dst_ysize > L(float(ysize))
    dst_ysize2 = F.when(over_y, L(float(ysize)) - dst_yoff).otherwise(dst_ysize)
    src_ysize2 = F.when(over_y, dst_ysize2 / fy).otherwise(src_ysize)

    plan = (
        sources.withColumn("_keep", keep)
        .filter(F.col("_keep"))
        .select(
            "src_id",
            src_xoff.alias("src_xoff"), src_yoff.alias("src_yoff"),
            src_xsize2.alias("src_xsize"), src_ysize2.alias("src_ysize"),
            dst_xoff.alias("dst_xoff"), dst_yoff.alias("dst_yoff"),
            dst_xsize2.alias("dst_xsize"), dst_ysize2.alias("dst_ysize"),
        )
        .filter(
            (F.col("src_xsize") > 0) & (F.col("dst_xsize") > 0)
            & (F.col("src_ysize") > 0) & (F.col("dst_ysize") > 0)
        )
    )
    if separate:
        # band = rank of the kept source in catalog order (:1199+)
        from pyspark.sql import Window

        plan = plan.withColumn(
            "band", F.row_number().over(Window.orderBy("src_id")).cast("int")
        )
    return grid, plan
