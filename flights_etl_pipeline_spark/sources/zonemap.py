"""File-level zone maps: metadata-driven data skipping for unpartitioned
parquet directories.

Partition pruning (hive layout) and row-group statistics cover two of
the three skipping levels; the third -- choosing which FILES to list in
the scan at all -- is what table formats (Delta/Iceberg) persist as
per-file column stats. This module builds that stats table with plain
Spark (`input_file_name` + min/max aggregate) and serves pruned reads
from it. On a 100 TB fact table laid out sorted/z-ordered on the stats
column, a selective predicate reads a handful of files without touching
the rest -- before any footer is opened.

Scale notes: the stats build is one distributed scan (one row per file
after a map-side-combinable min/max agg); the stats table itself is
file-count-sized (tiny) and the pruned read's file list is computed
driver-side from it, exactly like a format manifest. Rebuild stats per
write generation (they are invalidated by compaction/append, like any
manifest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_zone_map(spark: SparkSession, path: str, col: str) -> DataFrame:
    """Per-file (min, max, rows) stats for ``col`` over a parquet dir."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(col).alias("min_v"),
            F.max(col).alias("max_v"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def pruned_read(
    spark: SparkSession,
    path: str,
    zone_map: DataFrame,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Read only files whose [min_v, max_v] range intersects [lo, hi].

    Returns (df, files_selected, files_total). The residual predicate is
    re-applied because a surviving file can still hold out-of-range rows.
    """
    stats = zone_map.select("file", "min_v", "max_v").collect()
    keep = [r["file"] for r in stats if r["max_v"] >= lo and r["min_v"] <= hi]
    if not keep:
        df = spark.read.parquet(path).filter(F.lit(False))
        return df, 0, len(stats)
    df = spark.read.parquet(*keep).filter(
        (F.col(col) >= lo) & (F.col(col) <= hi)
    )
    return df, len(keep), len(stats)
