"""Cache-lifetime hygiene: queries that persist() intermediates must not
leak cached blocks past their own execution.

A leaked cache accumulates across the driver's 150-query correctness
sweep (one shared session) and eventually evicts working memory; review
flagged exactly this class in round 1. Every persisting query runs here
at sf0.001 and the persistent-RDD map must be empty afterwards.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

# every registered query whose implementation calls .persist()
_PERSISTING = [
    "association_rules",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "fuzzy_customer_pairs",
    "dedup_recall_eval",
    "copurchase_pagerank",
    "copurchase_triangles",
    "copurchase_bfs_levels",
    "copurchase_linkpred_lsh",
    "dedup_clusters",
    "kmeans_embeddings",
]


@pytest.mark.parametrize("name", _PERSISTING)
def test_no_cached_blocks_leak(spark, name):
    from flights_etl_pipeline_spark.plans import queries as q
    from flights_etl_pipeline_spark.plans.registry import REGISTRY

    spark.catalog.clearCache()
    REGISTRY[name].fn(spark, SF_DIR).collect()
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.iterator()
    leaked = []
    while it.hasNext():
        rdd = it.next()._2()
        # localCheckpoint RDDs legitimately stay registered -- they BACK
        # the returned result (k-row outputs); what must not survive is
        # a plain persisted intermediate
        if not rdd.isLocallyCheckpointed():
            leaked.append(rdd.toString())
    assert not leaked, f"{name} left cached intermediates: {leaked}"
