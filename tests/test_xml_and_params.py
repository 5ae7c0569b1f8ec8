"""Native XML format (Spark 4) and parameterized SQL surfaces."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_xml_roundtrip_preserves_rows(spark, tmp_path):
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    path = str(tmp_path / "nation_xml")
    nation.write.format("xml").option("rowTag", "nation").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .load(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    a = {tuple(r) for r in nation.select(
        "n_nationkey", "n_name", "n_regionkey").collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_parameterized_sql_named_args(spark):
    """Named-parameter SQL: the injection-safe surface for templated
    queries (vs f-string SQL assembly)."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    orders.createOrReplaceTempView("orders_p")
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM orders_p "
        "WHERE o_orderstatus = :st AND o_totalprice > :lo",
        args={"st": "F", "lo": 100000.0},
    ).first()["n"]
    want = orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0)
    ).count()
    assert got == want


def test_identifier_clause_parameterizes_table_name(spark):
    """IDENTIFIER(:name): dynamic table/column references that stay
    parse-safe — no string-spliced identifiers."""
    spark.read.parquet(f"{SF_DIR}/region.parquet").createOrReplaceTempView(
        "region_ident"
    )
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM IDENTIFIER(:t)",
        args={"t": "region_ident"},
    ).first()["n"]
    assert got == 5
