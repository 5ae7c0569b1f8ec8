"""Queries over the custom Python DataSource (sources/pysource.py).

The source generates rows as a pure function of the global row index, so
a DuckDB oracle over ``range(N)`` replays the generator arithmetically --
the source's partitioning, option plumbing, and row materialization are
all on the hash-checked path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.plans.registry import register
from flights_etl_pipeline_spark.sources.pysource import (
    AIRLINES,
    register_flights_synth,
)

_N_PARTS = 8
_ROWS_PER_PART = 1000
_N = _N_PARTS * _ROWS_PER_PART

_AIRLINES_SQL = "[" + ", ".join(f"'{a}'" for a in AIRLINES) + "]"

SYNTH_SOURCE_SQL = f"""
WITH rows_ AS (
  SELECT i,
         {_AIRLINES_SQL}[CAST(i % 7 AS INT) + 1] AS airline,
         (i * 37 + 11) % 1000000 AS fare_cents,
         DATE '2022-04-16' + INTERVAL (i % 365) DAY AS search_date
  FROM range({_N}) t(i)
)
SELECT airline,
       COUNT(*) AS n_itineraries,
       CAST(SUM(fare_cents) AS BIGINT) AS total_fare_cents,
       CAST(MIN(search_date) AS DATE) AS first_date,
       CAST(MAX(search_date) AS DATE) AS last_date
FROM rows_
GROUP BY airline
"""


@register(
    "synth_source_revenue",
    oracle=SYNTH_SOURCE_SQL,
    survey=["python-datasource", "S1-family", "source-extension"],
)
def synth_source_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the custom Python DataSource: the scan is produced
    by ``FlightsSynthSource`` (format("flights_synth"), 8 input
    partitions x 1000 rows), and the oracle replays the generator over
    ``range(8000)`` -- so partition bookkeeping bugs (dropped/duplicated
    partitions, wrong base offsets, option mis-parsing) fail the hash,
    not just the row count.

    Scale: the source streams rows per input partition (executor-side
    generators, driver never sees data); the aggregate is an ordinary
    partial+final hash agg on a 7-value key."""
    register_flights_synth(spark)
    src = (
        spark.read.format("flights_synth")
        .option("rows_per_partition", _ROWS_PER_PART)
        .option("num_partitions", _N_PARTS)
        .load()
    )
    return src.groupBy("airline").agg(
        F.count(F.lit(1)).alias("n_itineraries"),
        F.sum("fare_cents").alias("total_fare_cents"),
        F.min("search_date").alias("first_date"),
        F.max("search_date").alias("last_date"),
    )


@register(
    "synth_source_stream",
    oracle=SYNTH_SOURCE_SQL,
    survey=["python-datasource", "streaming", "offset-resume"],
)
def synth_source_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of synth_source_revenue through the custom Python
    STREAMING DataSource: the reader serves 2000-row micro-batches keyed
    by a global-row-index offset, and the query runs FOUR separate
    AvailableNow drains against one checkpoint -- each restart resumes
    from the committed offset (the reference's high-watermark pattern,
    ingestToBronze.py:59-66, as a first-class source contract). The
    complete-mode aggregate state survives the restarts, so the final
    table equals the batch oracle over all 8000 rows; a duplicated or
    skipped offset range fails the hash.
    """
    import os
    import shutil
    import uuid

    from flights_etl_pipeline_spark.sources.pysource import (
        register_flights_synth_stream,
    )

    register_flights_synth_stream(spark)
    qname = f"synth_stream_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join("/tmp", f"ckpt_{qname}")
    src = (
        spark.readStream.format("flights_synth_stream")
        .option("chunk", _ROWS_PER_PART * 2)
        .option("n_rows", _N)
        .load()
    )
    agg = src.groupBy("airline").agg(
        F.count(F.lit(1)).alias("n_itineraries"),
        F.sum("fare_cents").alias("total_fare_cents"),
        F.min("search_date").alias("first_date"),
        F.max("search_date").alias("last_date"),
    )
    try:
        for _ in range(4):  # 4 restarts x 2000-row prefetch = all 8000 rows
            q = (
                agg.writeStream.outputMode("complete")
                .format("memory")
                .queryName(qname)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        # materialize before the checkpoint (incl. state store) is removed
        out = spark.table(qname)
        out.count()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return out
