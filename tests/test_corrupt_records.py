"""Malformed-input handling: PERMISSIVE capture vs DROPMALFORMED.

Real 100 TB ingest always contains damaged rows; the engine must route
them without failing the job (ANSI mode makes naive casts throw, which
is why every fallible cast in the repo is try_cast)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def _write_csv(tmp_path) -> str:
    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,price\n"
        "1,10.5\n"
        "2,not_a_number\n"
        "3,30.25\n"
        "broken_line_only\n"
        "5,50.0\n"
    )
    return str(p)


def test_permissive_mode_quarantines_bad_rows(spark, tmp_path):
    path = _write_csv(tmp_path)
    df = (
        spark.read.schema(_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()  # corrupt-record column requires the raw row retained
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 3
    assert sorted(r.id for r in good.collect()) == [1, 3, 5]
    assert bad.count() == 2  # the text price row and the short row
    df.unpersist()


def test_dropmalformed_mode_keeps_only_parseable(spark, tmp_path):
    path = _write_csv(tmp_path)
    schema = T.StructType(_SCHEMA.fields[:2])
    df = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    rows = sorted((r.id, r.price) for r in df.collect())
    assert rows == [(1, 10.5), (3, 30.25), (5, 50.0)]
