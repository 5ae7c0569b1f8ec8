"""Custom Python DataSource sink: partition-parallel JSONL write with a
two-phase commit (staged files -> rename + _SUCCESS manifest)."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from flights_etl_pipeline_spark.sources.pysource import register_jsonl_sink


def test_jsonl_sink_roundtrip(spark, tmp_path):
    register_jsonl_sink(spark)
    out = str(tmp_path / "jsonl_out")
    df = (
        spark.range(1_000)
        .repartition(4)
        .select(F.col("id"), (F.col("id") % 9).alias("g"))
    )
    df.write.format("jsonl_sink").option("path", out).mode("append").save()

    # commit protocol: no staged .tmp survives, manifest totals match
    assert not glob.glob(os.path.join(out, "*.tmp"))
    files = glob.glob(os.path.join(out, "part-*.jsonl"))
    assert len(files) == 4
    with open(os.path.join(out, "_SUCCESS")) as f:
        manifest = json.load(f)
    assert manifest == {"rows": 1_000, "files": 4}

    back = spark.read.json(out)
    assert back.count() == 1_000
    assert back.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]
