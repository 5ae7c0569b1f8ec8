"""Global total order at scale: repartitionByRange + sortWithinPartitions.

A single .orderBy() write funnels 100 TB through a global sort whose
output still lands partition-by-partition; the scalable layout is range
repartitioning (sampled range bounds, parallel) + per-partition sort:
files end up internally sorted AND pairwise disjoint, which is exactly
what zone-map / min-max skipping needs to prune reads.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_range_sorted_write_gives_disjoint_sorted_files(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    path = str(tmp_path / "sorted")
    (
        orders.repartitionByRange(8, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.parquet(path)
    )
    back = spark.read.parquet(path).select(
        F.input_file_name().alias("f"), "o_totalprice"
    )
    stats = (
        back.groupBy("f")
        .agg(
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(stats) >= 2  # actually split across files
    assert sum(r["n"] for r in stats) == orders.count()
    # file ranges are pairwise disjoint -> concatenation is the total order
    spans = sorted((r["lo"], r["hi"]) for r in stats)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, (hi1, lo2)

    # and each file is internally sorted (pandas check per file)
    pdf = back.toPandas()
    for _f, grp in pdf.groupby("f"):
        vals = grp["o_totalprice"].tolist()
        assert vals == sorted(vals)
