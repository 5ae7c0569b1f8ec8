"""Zone-map data skipping: a range predicate over a sorted layout must
read a strict subset of files and still return exact results."""

from __future__ import annotations

from pyspark.sql import functions as F

from flights_etl_pipeline_spark.sources.zonemap import build_zone_map, pruned_read


def test_zone_map_prunes_files_and_preserves_results(spark, tmp_path):
    path = str(tmp_path / "sorted_fact")
    # range-partitioned + sorted layout: each of the 8 files owns a
    # disjoint key range, the precondition for file-level skipping
    (
        spark.range(8_000)
        .select(F.col("id").alias("k"), (F.col("id") * 7 % 100).alias("v"))
        .repartitionByRange(8, "k")
        .sortWithinPartitions("k")
        .write.mode("overwrite")
        .parquet(path)
    )
    zm = build_zone_map(spark, path, "k")
    assert zm.count() == 8

    df, n_sel, n_total = pruned_read(spark, path, zm, "k", 2_000, 2_999)
    assert n_total == 8
    assert n_sel <= 2  # 1000-key range spans at most 2 of 8 range files
    expected = (
        spark.read.parquet(path)
        .filter((F.col("k") >= 2_000) & (F.col("k") <= 2_999))
        .agg(F.sum("v"), F.count(F.lit(1)))
        .first()
    )
    got = df.agg(F.sum("v"), F.count(F.lit(1))).first()
    assert tuple(got) == tuple(expected)

    # empty intersection prunes everything
    df0, n0, _ = pruned_read(spark, path, zm, "k", 100_000, 200_000)
    assert n0 == 0 and df0.count() == 0
