"""mapInArrow: the zero-copy Arrow RecordBatch boundary (lowest-overhead
Python hook; mapInPandas adds a pandas conversion on top of this)."""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_map_in_arrow_batch_transform(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )

    def double_price(batches):
        for batch in batches:
            t = pa.table(
                {
                    "o_orderkey": batch.column("o_orderkey"),
                    "doubled": pa.compute.multiply(
                        batch.column("o_totalprice"), pa.scalar(2.0)
                    ),
                }
            )
            for out in t.to_batches():
                yield out

    got = orders.mapInArrow(
        double_price, "o_orderkey LONG, doubled DOUBLE"
    )
    assert got.count() == orders.count()
    joined = got.join(orders, "o_orderkey")
    bad = joined.filter(
        F.col("doubled") != F.col("o_totalprice") * 2.0
    ).count()
    assert bad == 0
