"""retention_delete: partition-directory GC with dry-run contract."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_partitions(spark, path):
    from flights_etl_pipeline_spark.sources.sinks import (
        write_partitioned_parquet,
    )

    df = spark.createDataFrame(
        [
            (2023, 11, 1.0),
            (2023, 12, 2.0),
            (2024, 1, 3.0),
            (2024, 2, 4.0),
            (2024, 3, 5.0),
        ],
        "year INT, month INT, v DOUBLE",
    )
    write_partitioned_parquet(
        df, path, partition_cols=("year", "month"), mode="overwrite"
    )


def test_dry_run_lists_but_keeps(spark, tmp_path):
    from flights_etl_pipeline_spark.sources.sinks import retention_delete

    path = str(tmp_path / "lake")
    _write_partitions(spark, path)
    doomed = retention_delete(
        spark, path, {"year": 2024, "month": 2}, dry_run=True
    )
    assert len(doomed) == 3  # 2023-11, 2023-12, 2024-01
    assert all("year=2023" in p or "month=1" in p for p in doomed)
    assert spark.read.parquet(path).count() == 5  # nothing deleted


def test_delete_prunes_old_partitions_only(spark, tmp_path):
    from flights_etl_pipeline_spark.sources.sinks import retention_delete

    path = str(tmp_path / "lake2")
    _write_partitions(spark, path)
    doomed = retention_delete(
        spark, path, {"year": 2024, "month": 2}, dry_run=False
    )
    assert len(doomed) == 3
    left = spark.read.parquet(path)
    assert left.count() == 2
    assert left.agg(F.min("v"), F.max("v")).first() == (4.0, 5.0)


def test_empty_parent_dirs_pruned_and_garbage_skipped(spark, tmp_path):
    import os

    from flights_etl_pipeline_spark.sources.sinks import retention_delete

    path = str(tmp_path / "lake3")
    _write_partitions(spark, path)
    # non-conforming partition dirs must be skipped, not crash the walk
    os.makedirs(os.path.join(path, "year=__HIVE_DEFAULT_PARTITION__"))
    os.makedirs(os.path.join(path, "year=2023", "month=junk"))
    doomed = retention_delete(
        spark, path, {"year": 2024, "month": 2}, dry_run=False
    )
    assert len(doomed) == 3
    # year=2023 kept only because month=junk remains inside; a purely
    # numeric 2023 subtree would be pruned entirely (checked below)
    retention_delete(spark, path, {"year": 2025, "month": 1}, dry_run=False)
    assert not os.path.isdir(os.path.join(path, "year=2024"))
