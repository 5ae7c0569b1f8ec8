"""read_with_evolution: mergeSchema across generations + conform."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def test_old_and_new_generations_conform(spark, tmp_path):
    from flights_etl_pipeline_spark.sources.readers import read_with_evolution

    path = str(tmp_path / "lake")
    # generation 1: (id, v)
    spark.createDataFrame([(1, 1.5), (2, 2.5)], "id LONG, v DOUBLE").write.mode(
        "append"
    ).parquet(path)
    # generation 2 adds `tag`
    spark.createDataFrame(
        [(3, 3.5, "x")], "id LONG, v DOUBLE, tag STRING"
    ).write.mode("append").parquet(path)

    target = StructType(
        [
            StructField("id", LongType()),
            StructField("v", DoubleType()),
            StructField("tag", StringType()),
        ]
    )
    df = read_with_evolution(spark, path, target)
    assert [f.name for f in df.schema.fields] == ["id", "v", "tag"]
    rows = {r["id"]: (r["v"], r["tag"]) for r in df.collect()}
    assert rows[1] == (1.5, None)  # old generation: tag null-filled
    assert rows[3] == (3.5, "x")

    # a plain read (no mergeSchema) may miss `tag` depending on which
    # footer wins -- the evolution read must not
    assert df.filter(F.col("tag").isNotNull()).count() == 1


def test_target_prunes_dropped_columns_and_casts(spark, tmp_path):
    from flights_etl_pipeline_spark.sources.readers import read_with_evolution

    path = str(tmp_path / "lake2")
    spark.createDataFrame(
        [(1, 10, "junk")], "id LONG, n INT, legacy STRING"
    ).write.parquet(path)
    target = StructType(
        [StructField("id", LongType()), StructField("n", LongType())]
    )
    df = read_with_evolution(spark, path, target)
    assert df.columns == ["id", "n"]
    assert dict(df.dtypes)["n"] == "bigint"  # upcast applied
    assert df.first()["n"] == 10
