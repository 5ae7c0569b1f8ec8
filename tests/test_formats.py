"""Source/sink format round-trips beyond parquet: ORC, JSON-lines, CSV.

Each asserts (a) value fidelity through a write+read cycle and (b) the
format keeps the scan-level contracts the engine relies on (pushdown /
pruning for columnar ORC; corrupt-row tolerance for JSON). Avro is
probed and skipped when the spark-avro module is not deployed.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.sources.readers import (
    read_csv_table,
    read_json_table,
    read_orc_table,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )


def _same_rows(a, b):
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    src = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_orc")
    src.write.orc(path)
    back = read_orc_table(spark, path)
    assert back.schema == src.schema
    assert _same_rows(back, src)
    plan = _plan(back.filter(F.col("o_orderkey") < 100).select("o_orderkey"))
    assert "PushedFilters: [" in plan and "o_orderkey" in plan
    schema_line = plan.split("ReadSchema")[1].splitlines()[0]
    assert "o_orderstatus" not in schema_line  # column pruning reaches scan


def test_json_lines_roundtrip_and_corrupt_tolerance(spark, sf_dir, tmp_path):
    src = _orders(spark, sf_dir).withColumn(
        "o_orderdate", F.col("o_orderdate").cast("string")
    )
    path = str(tmp_path / "orders_json")
    src.write.json(path)
    back = read_json_table(spark, path, schema=src.schema)
    assert _same_rows(back, src)

    # corrupt line under PERMISSIVE: nulls + _corrupt_record, job survives
    bad = tmp_path / "bad.json"
    bad.write_text('{"o_orderkey": 1, "o_orderstatus": "F"}\n{not json}\n')
    from pyspark.sql.types import StringType, StructField, StructType

    sch = StructType(
        [
            StructField("o_orderkey", StringType()),
            StructField("o_orderstatus", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    rows = read_json_table(spark, str(bad), schema=sch).collect()
    assert len(rows) == 2
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and "{not json}" in corrupt[0]["_corrupt_record"]


def test_csv_roundtrip_with_explicit_schema(spark, sf_dir, tmp_path):
    src = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_csv")
    src.write.option("header", "true").csv(path)
    back = read_csv_table(spark, path, schema=src.schema)
    assert back.schema == src.schema
    assert _same_rows(back, src)


def _avro_available(spark) -> bool:
    try:
        spark.range(1).write.format("avro").mode("overwrite").save(
            "/tmp/_avro_probe"
        )
        return True
    except Exception:
        return False


def test_avro_roundtrip_if_deployed(spark, sf_dir, tmp_path):
    if not _avro_available(spark):
        pytest.skip("spark-avro module not deployed in this container")
    src = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_avro")
    src.write.format("avro").save(path)
    assert _same_rows(spark.read.format("avro").load(path), src)
