"""Aggregates every registered query module into the driver contract.

Importing this module populates ``REGISTRY`` (each domain module registers
its queries at import time). ``__spark_entry__.py`` delegates here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Import order mirrors SURVEY.md section 7's build order; each import
# registers its queries as a side effect.
import flights_etl_pipeline_spark.plans.queries_core  # noqa: F401

try:  # widened in later build steps; keep entry green while building
    import flights_etl_pipeline_spark.plans.queries_arrays  # noqa: F401
except ImportError:
    pass
try:
    import flights_etl_pipeline_spark.plans.queries_events  # noqa: F401
except ImportError:
    pass
try:
    import flights_etl_pipeline_spark.plans.queries_text  # noqa: F401
except ImportError:
    pass
try:
    import flights_etl_pipeline_spark.plans.queries_dedup  # noqa: F401
except ImportError:
    pass
try:
    import flights_etl_pipeline_spark.plans.queries_simsearch  # noqa: F401
except ImportError:
    pass
try:
    import flights_etl_pipeline_spark.plans.queries_multimodal  # noqa: F401
except ImportError:
    pass
try:
    import flights_etl_pipeline_spark.plans.queries_streaming  # noqa: F401
except ImportError:
    pass
try:
    import flights_etl_pipeline_spark.plans.queries_incremental  # noqa: F401
except ImportError:
    pass
try:
    import flights_etl_pipeline_spark.plans.queries_ml  # noqa: F401
except ImportError:
    pass
try:
    import flights_etl_pipeline_spark.plans.queries_graph  # noqa: F401
except ImportError:
    pass

from flights_etl_pipeline_spark.plans.registry import REGISTRY


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.bench}
