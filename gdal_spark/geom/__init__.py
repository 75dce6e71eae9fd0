"""Pure-numpy geometry kernel.

No native geo deps (shapely/GEOS/pyproj unavailable in this stack);
all predicates / parsers / projections are vectorized numpy operating
on Arrow batches. Semantics documented against the GDAL reference
(file:line cites in each module).
"""

from gdal_spark.geom.batch import GeomBatch, GeomType  # noqa: F401
from gdal_spark.geom.wkt import parse_wkt, to_wkt  # noqa: F401
from gdal_spark.geom.wkb import geom_to_wkb, wkb_to_geom  # noqa: F401
from gdal_spark.geom.hilbert import hilbert_code, hilbert_code_xy  # noqa: F401
