"""Semantic invariants of the round-5 second-wave surfaces (hybrid RRF
retrieval, point-in-time feature snapshot, cross-modal integrity audit)
that the DuckDB parity gate cannot prove — the oracle is the same logic
re-expressed, so these check each query's *claim* by an independent
route:

- RRF fusion scores must be reconstructible from the emitted ranks by
  the published formula, and every fused doc must come from a leg;
- the PIT snapshot must be leakage-free: recomputing any feature with
  the label-window rows included must CHANGE rows that the snapshot
  left untouched (i.e. the snapshot provably ignored them), and the
  internal arithmetic (integer average, rates) must be self-consistent;
- the integrity audit's counts must equal closed-form counts derived
  directly from the id domain of the base tables.
"""

from __future__ import annotations

import pytest

from flights_etl_pipeline_spark.plans.queries_ml import feature_snapshot_pit
from flights_etl_pipeline_spark.plans.queries_profile import (
    corpus_integrity_audit,
)
from flights_etl_pipeline_spark.plans.queries_simsearch import (
    _HYBRID_LEG_K,
    _HYBRID_TOPK,
    _RRF_K,
    hybrid_retrieval_rrf,
)

SF_DIR = "/root/testdata/sf0.001"


def test_rrf_scores_reconstruct_from_ranks(spark):
    rows = hybrid_retrieval_rrf(spark, SF_DIR).collect()
    assert len(rows) == _HYBRID_TOPK
    for r in rows:
        assert r.lex_rank is not None or r.sem_rank is not None
        expect = 0
        if r.lex_rank is not None:
            assert 1 <= r.lex_rank <= _HYBRID_LEG_K
            expect += 1000000 // (_RRF_K + r.lex_rank)
        if r.sem_rank is not None:
            assert 1 <= r.sem_rank <= _HYBRID_LEG_K
            expect += 1000000 // (_RRF_K + r.sem_rank)
        assert r.rrf_micro == expect
    # the fused list is the top-10 by score: monotone non-increasing
    scores = [r.rrf_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    # rank-1 in any leg guarantees admission to the fused top-10 here
    # (its contribution alone, 1e6//61, beats the 10th score or ties)
    leg1 = [r for r in rows if r.lex_rank == 1 or r.sem_rank == 1]
    assert leg1, "a leg's top hit must survive fusion"


def test_rrf_both_legs_outrank_single_leg_at_same_rank(spark):
    """A doc ranked r in BOTH legs must score strictly above a doc
    ranked r in one leg only — the fusion property RRF exists for."""
    rows = hybrid_retrieval_rrf(spark, SF_DIR).collect()
    both = [r for r in rows if r.lex_rank is not None and r.sem_rank is not None]
    single = [r for r in rows if (r.lex_rank is None) != (r.sem_rank is None)]
    for b in both:
        for s in single:
            s_rank = s.lex_rank if s.lex_rank is not None else s.sem_rank
            if max(b.lex_rank, b.sem_rank) <= s_rank:
                assert b.rrf_micro > s.rrf_micro


def test_pit_snapshot_is_leakage_free(spark):
    """Recompute the same features with NO cutoff; customers whose only
    activity difference lies inside/after the label window must show
    identical features in the snapshot (proving those rows were
    excluded), and the snapshot's arithmetic must be self-consistent."""
    import duckdb

    out = {r.custkey: r for r in feature_snapshot_pit(spark, SF_DIR).collect()}
    assert out, "snapshot is non-empty"
    con = duckdb.connect()
    full = {
        k: (n, c)
        for k, n, c in con.execute(
            f"""
            SELECT o_custkey, COUNT(*),
                   CAST(SUM(CAST(FLOOR(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT)
            FROM '{SF_DIR}/orders.parquet' GROUP BY 1
            """
        ).fetchall()
    }
    pre = {
        k: (n, c)
        for k, n, c in con.execute(
            f"""
            SELECT o_custkey, COUNT(*),
                   CAST(SUM(CAST(FLOOR(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT)
            FROM '{SF_DIR}/orders.parquet'
            WHERE o_orderdate < TIMESTAMP '1997-06-01' GROUP BY 1
            """
        ).fetchall()
    }
    # every snapshot row must match the strictly-pre-cutoff recompute,
    # and at least one customer must differ from the no-cutoff version
    # (otherwise the cutoff predicate proved nothing on this fixture)
    differs = 0
    for k, r in out.items():
        assert (r.n_orders, r.spend_cents) == pre[k], f"leak at custkey {k}"
        if full[k] != pre[k]:
            differs += 1
    assert differs > 0, "fixture has no post-cutoff activity to exclude"
    for r in out.values():
        assert r.avg_order_cents == r.spend_cents // r.n_orders
        assert r.days_since_last >= 1  # last order strictly before T
        assert 0 <= r.return_rate_milli <= 1000
        assert r.label in (0, 1)
    labels = {r.label for r in out.values()}
    assert labels == {0, 1}, "label must be non-degenerate on the fixture"


def test_integrity_audit_counts_match_closed_form(spark):
    import duckdb

    rows = corpus_integrity_audit(spark, SF_DIR).collect()
    by_status: dict[str, int] = {}
    for r in rows:
        by_status[r.status] = by_status.get(r.status, 0) + r.n
    con = duckdb.connect()
    (n_docs,) = con.execute(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()
    ids = [
        v
        for (v,) in con.execute(
            f"SELECT vec_id FROM '{SF_DIR}/embeddings.parquet'"
        ).fetchall()
    ]
    missing = sum(1 for v in ids if v % 7 == 3)
    dim = sum(1 for v in ids if v % 7 != 3 and v % 17 == 5)
    orphan = sum(1 for v in ids if v % 11 == 0)
    assert by_status.get("missing_embedding", 0) == missing
    assert by_status.get("dim_mismatch", 0) == dim
    assert by_status.get("orphan_embedding", 0) == orphan
    assert by_status.get("ok", 0) == n_docs - missing - dim
    assert sum(by_status.values()) == n_docs + orphan
    # orphans carry no document row, so no real source
    for r in rows:
        if r.status == "orphan_embedding":
            assert r.source == "unknown"
        # milli shares are floor division of the grand total
        assert 0 <= r.share_milli <= 1000
