"""Column-expression library: scalar, array, text, and vector functions.

Everything here returns unevaluated ``pyspark.sql.Column`` expressions so
Catalyst can fold them into whole-stage codegen; Python/Pandas UDFs appear
only as explicitly-named ``*_udf`` variants kept for the UDF API surface
(SURVEY.md section 2.8) and for semantics built-ins cannot express.
"""

from flights_etl_pipeline_spark.functions.scalar import (  # noqa: F401
    davg,
    dsum,
    duration_to_minutes,
    duration_to_minutes_pandas_udf,
    iso_to_timestamp,
)
