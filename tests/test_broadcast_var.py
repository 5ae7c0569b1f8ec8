"""Broadcast variables inside Arrow-batched Python workers: ship a
lookup once per executor instead of once per task/row — the pattern for
side data too irregular for a join (config maps, small models)."""

from __future__ import annotations

import pandas as pd

SF_DIR = "/root/testdata/sf0.001"

_SEGMENT_TIER = {
    "AUTOMOBILE": "retail",
    "BUILDING": "industrial",
    "FURNITURE": "retail",
    "HOUSEHOLD": "retail",
    "MACHINERY": "industrial",
}


def test_broadcast_lookup_in_map_in_pandas(spark):
    bc = spark.sparkContext.broadcast(_SEGMENT_TIER)

    def tag(batches):
        lookup = bc.value  # deserialized once per worker
        for b in batches:
            yield pd.DataFrame(
                {
                    "c_custkey": b["c_custkey"],
                    "tier": b["c_mktsegment"].map(lookup).fillna("other"),
                }
            )

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    got = (
        cust.mapInPandas(tag, "c_custkey LONG, tier STRING")
        .groupBy("tier")
        .count()
        .collect()
    )
    tiers = {r["tier"]: r["count"] for r in got}
    want_industrial = cust.filter(
        cust.c_mktsegment.isin(["BUILDING", "MACHINERY"])
    ).count()
    assert tiers.get("industrial") == want_industrial
    assert sum(tiers.values()) == cust.count()
    bc.unpersist()
