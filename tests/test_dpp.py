"""Dynamic partition pruning: the 100 TB fact-scan killer feature.

A date-partitioned fact joined to a small filtered dimension must scan
only the partitions the dimension's filter selects -- at runtime, via the
reused broadcast result -- not the whole fact table. The reference's
entire lake layout is year=/month=/day= partitions (ingestToBronze.py:
79-84); static pruning covers literal predicates (test_plans.py), this
pins the *join-driven* case.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def partitioned_fact(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dpp") / "fact")
    fact = spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 20).cast("int").alias("day_part"),
        (F.col("id") * 3 % 1000).alias("v"),
    )
    fact.write.partitionBy("day_part").mode("overwrite").parquet(path)
    return path


def test_join_prunes_fact_partitions_dynamically(spark, partitioned_fact):
    fact = spark.read.parquet(partitioned_fact)
    dim = spark.range(20).select(
        F.col("id").cast("int").alias("day_part"),
        (F.col("id") % 4).alias("grp"),
    )
    joined = fact.join(dim.filter(F.col("grp") == 0), "day_part").agg(
        F.sum("v").alias("sv")
    )
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), plan
    # result must equal the statically-filtered equivalent
    expected = (
        fact.filter(F.col("day_part").isin([0, 4, 8, 12, 16]))
        .agg(F.sum("v"))
        .first()[0]
    )
    assert joined.first()["sv"] == expected
