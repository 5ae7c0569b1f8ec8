"""S5 with a REAL Hive metastore: ``enableHiveSupport()`` saveAsTable.

The reference's warehouse job writes partitioned external tables through
a thrift metastore (loadToWarehouse.py:44-78). The rebuild's in-process
catalog covers the semantics (tests/test_pipeline_e2e.py); this test
additionally exercises the hive catalog implementation against a local
Derby-backed metastore, covering the reference's actual deployment shape
with zero new dependencies (Spark ships hive-metastore + datanucleus).

The hive session must own the JVM's first SparkSession (catalog
implementation is fixed at creation), so the test runs in a subprocess.
"""

from __future__ import annotations

import os
import subprocess
import sys

SCRIPT = r"""
import os, sys, tempfile
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from flights_etl_pipeline_spark.sources.sinks import ensure_database, save_as_table

tmp = tempfile.mkdtemp(prefix="hive_wh_")
spark = (
    SparkSession.builder.master("local[4]")
    .appName("hive-warehouse-test")
    .config("spark.sql.warehouse.dir", os.path.join(tmp, "warehouse"))
    .config(
        "javax.jdo.option.ConnectionURL",
        "jdbc:derby:memory:metastore;create=true",
    )
    .config("datanucleus.schema.autoCreateAll", "true")
    .config("hive.metastore.schema.verification", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .enableHiveSupport()
    .getOrCreate()
)
assert spark.conf.get("spark.sql.catalogImplementation") == "hive", (
    "session is not hive-backed"
)

orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
    "o_orderkey",
    "o_custkey",
    F.col("o_totalprice").cast("double").alias("o_totalprice"),
    F.year("o_orderdate").alias("year"),
    F.month("o_orderdate").alias("month"),
)

ensure_database(spark, "warehouse_db")
ext_path = os.path.join(tmp, "external", "fact_flight_activities")
save_as_table(
    orders,
    "warehouse_db",
    "fact_flight_activities",
    path=ext_path,
    partition_cols=("year", "month"),
    mode="overwrite",
)

# metastore sees the table
tables = [t.name for t in spark.catalog.listTables("warehouse_db")]
assert "fact_flight_activities" in tables, tables

# partition spec registered in the metastore, not just directory layout
parts = spark.sql(
    "SHOW PARTITIONS warehouse_db.fact_flight_activities"
).collect()
assert len(parts) > 1 and "year=" in parts[0][0], parts[:3]

# external location honored
detail = spark.sql(
    "DESCRIBE TABLE EXTENDED warehouse_db.fact_flight_activities"
).collect()
loc = [r for r in detail if r.col_name == "Location"][0].data_type
assert ext_path in loc, loc

# round-trip through the catalog name
back = spark.table("warehouse_db.fact_flight_activities")
assert back.count() == orders.count()
assert set(back.columns) == set(orders.columns)

# append mode lands in the same partitions (idempotent layout, 2x rows)
save_as_table(
    orders, "warehouse_db", "fact_flight_activities",
    path=ext_path, partition_cols=("year", "month"), mode="append",
)
assert spark.table("warehouse_db.fact_flight_activities").count() == 2 * orders.count()

print("HIVE_OK")
"""


def test_hive_metastore_save_as_table():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/tmp",
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "HIVE_OK" in proc.stdout
