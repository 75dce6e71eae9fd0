from gdal_spark.streaming.ingest import (  # noqa: F401
    stream_docs_from_rate,
    stream_spatial_join,
    windowed_zone_counts,
    write_stream_with_lineage,
)
