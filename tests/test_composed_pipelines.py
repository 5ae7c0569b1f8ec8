"""Semantic invariants of the round-5 composed pipelines that parity
CANNOT prove: the DuckDB oracle is the same logic re-expressed, so a
shared misconception would pass the value gate. These tests check the
claims the queries exist for, by an independent route:

- the shard manifests' 100 TB resumability claim is literally
  "identical rows regardless of input layout/arrival order" -- proven
  by re-running over a re-partitioned, re-ordered copy of the corpus;
- the GDPR audit's arithmetic must agree with an independently-derived
  subject list;
- the reconcile plan must flag exactly the partitions its derivation
  rule damages.
"""

from __future__ import annotations

import os
import shutil

import pytest

from flights_etl_pipeline_spark.plans.queries_incremental import (
    forget_user_pipeline,
    partition_reconcile_repair,
)
from flights_etl_pipeline_spark.plans.queries_ml import (
    shard_manifest_delta,
    training_shard_manifest,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def shuffled_sf_dir(tmp_path_factory):
    """sf0.001 with documents rewritten re-partitioned and re-ordered:
    same rows, different file layout and row order."""
    from flights_etl_pipeline_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=8)
    out = str(tmp_path_factory.mktemp("shuffled_sf"))
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        os.symlink(
            os.path.join(SF_DIR, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
        )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    (
        docs.repartition(7, "source")
        .sortWithinPartitions("lang")
        .write.parquet(os.path.join(out, "documents.parquet"))
    )
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_shard_manifest_is_layout_invariant(spark, shuffled_sf_dir):
    base = _rows(training_shard_manifest(spark, SF_DIR))
    shuffled = _rows(training_shard_manifest(spark, shuffled_sf_dir))
    assert base == shuffled


def test_shard_manifest_delta_is_layout_invariant(spark, shuffled_sf_dir):
    base = _rows(shard_manifest_delta(spark, SF_DIR))
    shuffled = _rows(shard_manifest_delta(spark, shuffled_sf_dir))
    assert base == shuffled


def test_forget_audit_matches_independent_subject_list(spark):
    rows = {r.table_name: r for r in forget_user_pipeline(spark, SF_DIR).collect()}
    assert set(rows) == {"events", "orders", "customer"}

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    subjects = {r.c_custkey for r in cust if r.c_custkey % 13 == 0}
    assert rows["customer"].rows_affected == len(subjects)
    assert rows["customer"].rows_after == len(cust) - len(subjects)

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    hit = sum(1 for r in ev if r.user_id in subjects)
    assert rows["events"].rows_affected == hit
    assert rows["events"].rows_after == len(ev) - hit
    assert rows["events"].policy == "delete"

    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    ohit = sum(1 for r in od if r.o_custkey in subjects)
    assert rows["orders"].rows_affected == ohit
    # anonymize keeps the fact rows
    assert rows["orders"].rows_after == len(od)
    assert rows["orders"].n_users_affected == len(
        {r.o_custkey for r in od if r.o_custkey in subjects}
    )


def test_merge_schema_evolution_semantics(spark):
    """The evolved column must be present ONLY on rows last touched by
    the post-evolution generation; untouched rows keep original values.
    gen1 = keys %5==0 (no loyalty_tier), gen2 = keys %7==0 (adds it);
    latest-generation-wins on overlap (%35==0)."""
    from flights_etl_pipeline_spark.plans.queries_incremental import (
        merge_schema_evolution,
    )

    out = {r.c_custkey: r for r in merge_schema_evolution(spark, SF_DIR).collect()}
    orig = {
        r.c_custkey: r
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    assert set(out) == set(orig)
    for k, r in out.items():
        if k % 7 == 0:  # gen2 wins, including the %35 overlap
            assert r.src_gen == 2
            assert r.loyalty_tier == ("GOLD" if k % 14 == 0 else "SILVER")
            assert abs(r.c_acctbal - (orig[k].c_acctbal + 200.0)) < 1e-9
        elif k % 5 == 0:  # pre-evolution producer: no tier column value
            assert r.src_gen == 1 and r.loyalty_tier is None
            assert abs(r.c_acctbal - (orig[k].c_acctbal + 100.0)) < 1e-9
        else:  # untouched
            assert r.src_gen == 0 and r.loyalty_tier is None
            assert r.c_acctbal == orig[k].c_acctbal


def test_reconcile_flags_exactly_the_damaged_partitions(spark):
    rows = partition_reconcile_repair(spark, SF_DIR).collect()
    by_status: dict[str, int] = {}
    for r in rows:
        by_status[r.action] = by_status.get(r.action, 0) + 1
    assert set(by_status) <= {"copy", "repair", "ok"}
    # the derivation rule damages every 7th partition (missing) and
    # every 7th-offset-5 (rows dropped), so both classes must be
    # non-empty and everything else ok
    assert by_status.get("copy", 0) >= 1
    assert by_status.get("repair", 0) >= 1
    assert by_status.get("ok", 0) >= 1
