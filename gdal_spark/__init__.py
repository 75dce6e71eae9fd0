"""gdal_spark — a PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing semantics of GDAL/OGR 3.14
(reference at /root/reference, see SURVEY.md) as distributed DataFrame
operators: H3/S2-style cell indexing, broadcast R-tree polygon joins,
rasterize / polygonize / warp / tile as Arrow-batched numpy kernels,
plus OGR-SQL-compatible relational semantics on top of Spark SQL.

Not a port: the reference is single-node C++; this engine declares
logical plans with the DataFrame API and keeps all hot loops in
vectorized numpy inside pandas/Arrow UDFs (no per-row Python).
"""

__version__ = "0.1.0"

from gdal_spark.session import get_spark  # noqa: F401
