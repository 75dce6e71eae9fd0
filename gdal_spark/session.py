"""SparkSession factory tuned for the engine.

Arrow execution on (the reference itself streams features as Arrow
batches of 65,536 — ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp:2079 —
so columnar batch execution is the semantically-endorsed path), AQE on
for runtime skew handling, shuffle partitions sized for local testing
but overridable for cluster runs via env.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size matches the reference's default feature batch
# (ogrlayerarrow.cpp:2079: 65,536 features per batch).
ARROW_BATCH_SIZE = 65_536


def get_spark(
    app_name: str = "gdal_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    On a real cluster this is driven by spark-submit; master/conf here
    only apply when no session exists yet (local dev / tests / bench).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_SIZE))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 100 TB scale: files are split into ~128MB tasks by default;
        # keep the default but make it explicit and overridable.
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # Constraint propagation re-derives extra predicates from every
        # filter conjunct; on this engine's envelope-math filters (the
        # 4-corner inverse-geotransform trees in rasterize/tile_keys,
        # duplicated through least/greatest) the inferred predicates
        # re-evaluate each corner tree per row without CSE — measured
        # 16x slower on the rasterize explode filter (5.8 s -> 0.35 s
        # for the same stage over 2M cached rows, local[8]). The
        # inference exists to push IsNotNull toward scans; every query
        # here filters its null/bounds conditions explicitly, so the
        # lost inference changes no result (the 190+-query DuckDB gate
        # pins that) and no pushdown this engine relies on.
        .config("spark.sql.constraintPropagation.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
