"""Round-12 operators: snapshot_expire mechanism tests.

The compaction ledger must be consistent with the snapshot-isolation
read path it twins: the surviving base images ARE the state snapshot
{floor} committed, and per key the ledger arithmetic must account for
every log entry exactly once.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_ledger_accounts_for_every_log_entry(spark):
    """versions_total == versions_reclaimed + retained, where retained
    is the kept base entry (1 if the key has any pre-floor history and
    is live OR its tombstone survives as nothing — reclaimed too) plus
    the untouched tail."""
    from flights_etl_pipeline_spark.plans.queries_incremental import (
        snapshot_expire,
    )

    rows = snapshot_expire(spark, SF).collect()
    assert rows
    for r in rows:
        kept_base = 1 if r["base_live"] else 0
        assert (
            r["versions_total"]
            == r["versions_reclaimed"] + kept_base + r["tail_versions"]
        ), r
        if not r["base_live"]:
            assert r["base_acctbal"] is None and (
                r["base_mktsegment"] is None
            ), r


def test_compacted_base_equals_snapshot_floor_state(spark):
    """The compacted base (live ledger rows' images) must be EXACTLY
    the state snapshot_isolation_read reconstructs at the expire floor
    — expiry must never change what a retained snapshot sees."""
    from flights_etl_pipeline_spark.plans.queries_incremental import (
        _EXPIRE_FLOOR,
        snapshot_expire,
        snapshot_isolation_read,
    )

    base = {
        r["c_custkey"]: (r["base_acctbal"], r["base_mktsegment"],
                         r["base_gen"])
        for r in snapshot_expire(spark, SF).collect()
        if r["base_live"]
    }
    pinned = {
        r["c_custkey"]: (r["c_acctbal"], r["c_mktsegment"], r["version"])
        for r in snapshot_isolation_read(spark, SF).collect()
        if r["snapshot_id"] == _EXPIRE_FLOOR
    }
    assert base == pinned


def test_cascade_tier_invariants(spark):
    """ann_cascade_topk: per query the ranks are contiguous from 1,
    cosine is non-increasing along the rank order (ties broken by
    vec_id), at most K rows survive, every survivor sits within the
    query's Hamming budget threshold, and every survivor's frozen IVF
    cell is one of the query's probed cells."""
    from flights_etl_pipeline_spark.plans.queries_simsearch import (
        _CSC_K,
        _CSC_Q,
        _centroids,
        _nearest_cid,
        _probe_select,
        ann_cascade_topk,
    )
    from pyspark.sql import functions as F

    sf = SF
    rows = ann_cascade_topk(spark, sf).collect()
    assert rows
    byq = {}
    for r in rows:
        byq.setdefault(r["qid"], []).append(r)
    assert set(byq) <= set(range(_CSC_Q))
    cents = _centroids(spark, sf)
    from flights_etl_pipeline_spark.plans.registry import load

    cell = {
        r["vec_id"]: r["cid"]
        for r in load(spark, sf, "embeddings")
        .select("vec_id", _nearest_cid(cents).alias("cid"))
        .collect()
    }
    for qid, rs in byq.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _CSC_K
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        probe_cids = _probe_select(spark, sf, cents, q_vec_id=qid)[0]
        for r in rs:
            assert cell[r["vec_id"]] in probe_cids, (qid, r)

    # tier-0 sanity: the self-match (Hamming 0, cosine 1) must survive
    # the whole cascade when its own cell is probed (it always is: the
    # nearest centroid to a centroid-query is itself)
    for qid, rs in byq.items():
        assert rs[0]["vec_id"] == qid and rs[0]["ham"] == 0, rs[0]


def test_ledger_key_classes(spark):
    """Spot the four CDC shapes in the ledger: restored keys reclaim
    their whole pre-floor history including the tombstone and keep a
    1-entry tail; plain keys reclaim nothing; post-floor inserts exist
    with no base."""
    from flights_etl_pipeline_spark.plans.queries_incremental import (
        snapshot_expire,
    )

    rows = {r["c_custkey"]: r for r in snapshot_expire(spark, SF).collect()}
    restored = [
        r for k, r in rows.items()
        if k % 13 == 0 and k % 3 == 0 and k < 10_000_000
    ]
    assert restored
    for r in restored:  # gen0 I + gen1 D reclaimed; gen2 I retained
        assert r["versions_total"] == 3
        assert r["versions_reclaimed"] == 2
        assert not r["base_live"]
        assert r["tail_versions"] == 1
    plain = [
        r for k, r in rows.items()
        if k < 10_000_000
        and all(k % m for m in (5, 7, 11, 13, 97))
    ]
    assert plain
    for r in plain:
        assert r["versions_total"] == 1
        assert r["versions_reclaimed"] == 0
        assert r["base_live"] and r["base_gen"] == 0
        assert r["tail_versions"] == 0
