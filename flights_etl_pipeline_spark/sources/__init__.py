"""Sources and sinks (SURVEY.md section 2.1, S1-S10)."""

from flights_etl_pipeline_spark.sources.readers import (  # noqa: F401
    high_watermark,
    path_exists,
    read_csv_table,
    read_jdbc_partitioned,
    read_parquet_table,
)
from flights_etl_pipeline_spark.sources.sinks import (  # noqa: F401
    ensure_database,
    mkdirs,
    save_as_table,
    write_partitioned_parquet,
)
