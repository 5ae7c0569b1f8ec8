"""Sinks: partitioned parquet append, managed/external tables, catalog and
filesystem DDL (S4, S5, S8, S9).

Differences from the reference, by design:
- No ``repartition(10000)`` before writes (defect D9) -- AQE coalescing
  sizes output partitions; ``maxRecordsPerFile`` bounds file size instead
  of a magic shuffle width.
- ``partitionOverwriteMode=dynamic`` (set in session.py) makes re-runs of
  a day idempotent instead of appending duplicates.
- The reference's chunked-write loop (transformToSilver.py:100-122, with
  defect D1's stale bounds) is unnecessary: a partitioned write streams
  per-task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("year", "month", "day"),
    mode: str = "append",
    max_records_per_file: int = 5_000_000,
) -> None:
    """S4: hive-layout partitioned parquet write
    (ingestToBronze.py:84; transformToSilver.py:118)."""
    (
        df.write.partitionBy(*partition_cols)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .mode(mode)
        .parquet(path)
    )


def save_as_table(
    df: DataFrame,
    database: str,
    table: str,
    path: str | None = None,
    partition_cols: tuple[str, ...] = (),
    mode: str = "append",
) -> None:
    """S5: saveAsTable into a database, optionally external (``path``) and
    partitioned (updateToGold.py:47-48; loadToWarehouse.py:44-78)."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(f"{database}.{table}")


def ensure_database(spark: SparkSession, database: str) -> None:
    """S9: CREATE DATABASE IF NOT EXISTS (flight_pipeline.py:42-45)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")


def mkdirs(spark: SparkSession, path: str) -> bool:
    """S8: filesystem mkdir -p via the JVM FileSystem API
    (the DAG's BashOperator hdfs mkdirs, flight_pipeline.py:29-37)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(jsc.hadoopConfiguration())
    return bool(fs.mkdirs(hadoop_path))
