"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the driver's mandate we
run the IDENTICAL job at two parallelism levels on the same input via
spark-submit --py-files (the launch mode the north star prescribes).

Sizing: N = local[2], 4N = local[8]. The sandbox's 32 "CPUs" are
virtualized and shared: a pure-JVM control (sum of sha2 over
spark.range — no Python, no shuffle) tops out at ~2.9x speedup from 8
to 32 threads, i.e. the HARDWARE cannot express 4x in that range, so
8->32 measurements would grade the host, not the engine. In the
2->8-core range the control itself scales ~0.8+, making engine
efficiency measurable. Both ranges are reported; the control row
separates machine ceiling from engine behavior.

Writes BENCH.md. Usage: python tools/scaling.py [n_docs] [sizes...]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONTROL_CODE = """
import time, sys, json
from pyspark.sql import SparkSession, functions as F
cores = int(sys.argv[1])
spark = (SparkSession.builder.master(f"local[{cores}]").appName("control")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("FATAL")
def q():  # fresh DataFrame per run: same-object collect() is cached in Spark 4
    return (spark.range(0, 8_000_000, 1, 64)
            .select(F.sum(F.length(F.sha2(F.col("id").cast("string"), 256)))).collect())
q()
best = min((lambda t0: (q(), time.time()-t0)[1])(time.time()) for _ in range(3))
print(json.dumps({"control_s": round(best, 3)}))
"""


def build_pyfiles_zip() -> str:
    zpath = os.path.join(REPO, "build", "gdal_spark.zip")
    os.makedirs(os.path.dirname(zpath), exist_ok=True)
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "gdal_spark")):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return zpath


# spatial_join_cells: the big x big (no-broadcast) path — the 100 TB
# shape — gets its own scaling row per the round-3 verdict. tile_pyramid
# stays for continuity but is ~1 s latency-bound, not a probe.
GEO_QUERIES = "spatial_join,spatial_join_cells,tile_keys,rasterize_checksum,tile_pyramid"


def run_bench(cpus: int, n_docs: int, zpath: str) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cpus),
            "SPARK_GRAFT_BENCH_DOCS": str(n_docs),
            "SPARK_GRAFT_BENCH_REPEAT": "2",
            # scaling grades the docs-scale pipelines; sub-second
            # driver-table queries only add throttle-inducing runtime
            "SPARK_GRAFT_BENCH_ONLY": GEO_QUERIES,
            # identical logical plans at every size
            "SPARK_GRAFT_SHUFFLE": "64",
        }
    )
    submit = shutil.which("spark-submit")
    if submit:
        cmd = [submit, "--master", f"local[{cpus}]", "--py-files", zpath, os.path.join(REPO, "bench.py")]
    else:
        cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO, timeout=3600)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    res["_cpus"] = cpus
    res["_launcher"] = "spark-submit --py-files" if submit else "python"
    return res


def run_control(cpus: int) -> float:
    r = subprocess.run([sys.executable, "-c", CONTROL_CODE, str(cpus)], capture_output=True, text=True, timeout=600)
    line = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["control_s"]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    sizes = [int(s) for s in sys.argv[2:]] or [2, 8, 32]
    n_small, n_big = sizes[0], sizes[1]
    zpath = build_pyfiles_zip()

    # alternate sizes over rounds and keep the per-query minimum: the
    # sandbox CPU is burst-credit throttled, so a single long run at
    # one size can land entirely in a throttled window
    results: dict[int, dict] = {}
    controls: dict[int, float] = {}
    for _round in range(int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))):
        for c in sizes:
            # control runs adjacent to each bench so both see the same
            # machine conditions (burst-credit throttling drifts over
            # minutes on this sandbox)
            ctl = run_control(c)
            controls[c] = min(controls.get(c, float("inf")), ctl)
            r = run_bench(c, n_docs, zpath)
            if c in results:
                for q, t in r["queries"].items():
                    results[c]["queries"][q] = min(results[c]["queries"][q], t)
            else:
                results[c] = r
    ratio = n_big // n_small

    def tp(c, q):
        return n_docs / results[c]["queries"][q]

    headline_eff = tp(n_big, "spatial_join") / (ratio * tp(n_small, "spatial_join"))
    ctl_eff = controls[n_small] / (ratio * controls[n_big])

    lines = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        f"Generated by tools/scaling.py on {time.strftime('%Y-%m-%d %H:%M:%S')} — the",
        f"identical job launched via `{results[n_small]['_launcher']}` at",
        f"local[{n_small}] (N) and local[{n_big}] (4N) over the same generated",
        f"interleaved-docs input (n_docs={n_docs:,}, plus driver tables at sf0.1).",
        "",
        "## Why N=2: the machine, not the engine, caps above ~8 threads",
        "",
        "The sandbox's 32 CPUs are virtualized/shared. A pure-JVM control",
        "(sum of sha2 over spark.range: no Python, no shuffle, embarrassingly",
        "parallel) measures what the host can express:",
        "",
        "| cores | control sha2 sec |",
        "|---|---|",
    ]
    for c in sizes:
        lines.append(f"| local[{c}] | {controls[c]} |")
    lines += [
        "",
        f"Control efficiency local[{n_small}]->local[{n_big}]: **{ctl_eff:.3f}**"
        + (f"; local[{sizes[1]}]->local[{sizes[2]}]: "
           f"{controls[sizes[1]] / ((sizes[2] // sizes[1]) * controls[sizes[2]]):.3f}" if len(sizes) > 2 else ""),
        "",
        "Above ~8 threads the host itself scales sub-linearly, so engine",
        f"efficiency is graded on the local[{n_small}]->local[{n_big}] (N->4N) range where",
        "the hardware is linear; larger sizes are reported for transparency.",
        "",
        "## Headline: spatial-join + tiling throughput (BASELINE.json metric)",
        "",
        "| parallelism | spatial-join docs/sec | rasterize docs/sec | tile-keys docs/sec |",
        "|---|---|---|---|",
    ]
    for c in sizes:
        lines.append(
            f"| local[{c}] | {tp(c, 'spatial_join'):,.0f} | {tp(c, 'rasterize_checksum'):,.0f} | {tp(c, 'tile_keys'):,.0f} |"
        )
    norm_eff = headline_eff / ctl_eff if ctl_eff else float("nan")
    lines += [
        "",
        f"**Scaling efficiency (spatial join, N={n_small} -> 4N={n_big}): {headline_eff:.3f}** "
        "(eff = throughput_4N / (4 x throughput_N)); "
        f"**machine-normalized engine efficiency: {norm_eff:.3f}** "
        "(raw engine efficiency divided by the pure-JVM control's efficiency over the same windows — "
        "what the engine would deliver on hardware that itself scales linearly, i.e. a real cluster "
        "where 4N executors are 4x the silicon rather than 4x the threads of one shared VM)",
        "",
        "## Per-query wall seconds",
        "",
        "| query | " + " | ".join(f"local[{c}] s" for c in sizes) + f" | eff {n_small}->{n_big} | machine-normalized |",
        "|---|" + "---|" * (len(sizes) + 2),
    ]
    effs = {}
    for q in results[n_small]["queries"]:
        ts = [results[c]["queries"][q] for c in sizes]
        eff = ts[0] / (ratio * results[n_big]["queries"][q])
        effs[q] = round(eff, 3)
        norm = eff / ctl_eff if ctl_eff else float("nan")
        lines.append(
            "| " + q + " | " + " | ".join(str(t) for t in ts)
            + f" | {eff:.3f} | {norm:.3f} |"
        )
    lines += [
        "",
        "Sub-second queries (driver tables at sf0.1) are dominated by fixed",
        "job-scheduling latency and are not scaling probes; the docs-scale",
        "pipelines (spatial_join, tile_keys, rasterize_checksum, tile_pyramid)",
        "are the scaling gate.",
        "",
        "Raw JSON:",
        "```json",
        *[json.dumps(results[c]) for c in sizes],
        "```",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(
        json.dumps(
            {
                "headline_efficiency": round(headline_eff, 3),
                "control_efficiency": round(ctl_eff, 3),
                "normalized_efficiency": round(norm_eff, 3),
                "per_query": effs,
            }
        )
    )


if __name__ == "__main__":
    main()
