"""Round-6 additions: semantic invariants beyond the oracle hash.

packing_curve must agree with seq_packing where they overlap (the
512-token leg is the same deterministic spillover packing), and its
per-source curve must behave like a packing curve (pack count
non-increasing in capacity). matryoshka_recall_curve's full-dimension
leg is recall 1000 by construction — anything else means the truncated
scorer and the truth scorer disagree on the untruncated vector.
"""

from __future__ import annotations

from tests.test_plans import SF_DIR


def test_packing_curve_512_matches_seq_packing(spark):
    from flights_etl_pipeline_spark.plans.queries_ml import (
        packing_curve,
        seq_packing,
    )

    curve = {
        (r.source, r.capacity): r
        for r in packing_curve(spark, SF_DIR).collect()
    }
    packs = seq_packing(spark, SF_DIR).collect()
    by_source: dict[str, dict] = {}
    for p in packs:
        agg = by_source.setdefault(
            p.source, {"n_packs": 0, "tokens": 0, "docs": 0}
        )
        agg["n_packs"] = max(agg["n_packs"], p.pack_id + 1)
        agg["tokens"] += p.pack_tokens
        agg["docs"] += p.n_docs
    for source, agg in by_source.items():
        row = curve[(source, 512)]
        assert row.n_packs == agg["n_packs"], source
        assert row.total_tokens == agg["tokens"], source
        assert row.n_docs == agg["docs"], source


def test_packing_curve_shape(spark):
    from flights_etl_pipeline_spark.plans.queries_ml import (
        _PACK_CURVE_CAPS,
        packing_curve,
    )

    rows = packing_curve(spark, SF_DIR).collect()
    by_source: dict[str, dict[int, object]] = {}
    for r in rows:
        by_source.setdefault(r.source, {})[r.capacity] = r
    for source, caps in by_source.items():
        assert set(caps) == set(_PACK_CURVE_CAPS), source
        ordered = [caps[c] for c in sorted(caps)]
        # larger context -> never more packs
        n_packs = [r.n_packs for r in ordered]
        assert n_packs == sorted(n_packs, reverse=True), source
        for r in ordered:
            assert 0 <= r.n_straddle <= r.n_docs, (source, r.capacity)
            assert r.util_milli > 0, (source, r.capacity)


def test_matryoshka_full_dim_is_exact(spark):
    from flights_etl_pipeline_spark.plans.queries_simsearch import (
        _MRL_DIMS,
        matryoshka_recall_curve,
    )

    rows = {r.dim: r for r in matryoshka_recall_curve(spark, SF_DIR).collect()}
    assert set(rows) == set(_MRL_DIMS)
    assert rows[64].recall_milli == 1000, (
        "the untruncated leg must reproduce the exact top-k"
    )
    for r in rows.values():
        assert 0 <= r.n_hits <= 10
        assert r.recall_milli == r.n_hits * 100


def test_perplexity_buckets_are_exact_tertiles(spark):
    from flights_etl_pipeline_spark.plans.queries_text import (
        doc_perplexity_buckets,
    )

    rows = doc_perplexity_buckets(spark, SF_DIR).collect()
    by_lang: dict[str, dict[str, object]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, buckets in by_lang.items():
        assert set(buckets) <= {"head", "middle", "tail"}, lang
        n = sum(r.n_docs for r in buckets.values())
        # exact integer tertile cut: head = floor(n/3),
        # middle = floor(2n/3) - floor(n/3), tail = the rest
        if "head" in buckets:
            assert buckets["head"].n_docs == n // 3, lang
        if "middle" in buckets:
            assert buckets["middle"].n_docs == (2 * n) // 3 - n // 3, lang
        if "tail" in buckets:
            assert buckets["tail"].n_docs == n - (2 * n) // 3, lang
        # fluency must not increase down the buckets
        order = [b for b in ("head", "middle", "tail") if b in buckets]
        avgs = [buckets[b].avg_lp_micro for b in order]
        assert avgs == sorted(avgs, reverse=True), (lang, avgs)


def test_zonemap_audit_clustering_wins(spark):
    """The date-clustered layout must skip strictly more files than the
    arrival layout for a time-range predicate (the whole point of the
    audit), both layouts must see the same matched-row total, and a
    skipping reader must still scan every matching row."""
    from flights_etl_pipeline_spark.plans.queries_core import (
        zonemap_skipping_audit,
    )

    rows = {r.layout: r for r in zonemap_skipping_audit(spark, SF_DIR).collect()}
    assert set(rows) == {"arrival", "date_clustered"}
    a, c = rows["arrival"], rows["date_clustered"]
    assert a.rows_matched == c.rows_matched > 0
    assert c.files_skipped > a.files_skipped
    for r in (a, c):
        assert r.rows_scanned >= r.rows_matched
        assert 0 <= r.files_skipped <= r.n_files
        assert r.skip_milli == r.files_skipped * 1000 // r.n_files
    # clustering should also shrink the scanned volume
    assert c.rows_scanned < a.rows_scanned


def test_attribution_totals_and_none_consistency(spark):
    """Every purchase contributes exactly one first-position and one
    last-position row; a purchase is 'none' at first iff 'none' at
    last (an empty lookback is empty from both ends), and attributed
    positions must agree on total count and revenue."""
    import duckdb

    from flights_etl_pipeline_spark.plans.queries_events import (
        events_attribution,
    )

    rows = events_attribution(spark, SF_DIR).collect()
    (n_purch,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet' "
        "WHERE event_type = 'purchase'"
    ).fetchone()
    first = [r for r in rows if r.position == "first"]
    last = [r for r in rows if r.position == "last"]
    assert sum(r.n_purchases for r in first) == n_purch
    assert sum(r.n_purchases for r in last) == n_purch
    fn = {r.touch_type: r for r in first}
    ln = {r.touch_type: r for r in last}
    f_none = fn.get("none")
    l_none = ln.get("none")
    assert (f_none.n_purchases if f_none else 0) == (
        l_none.n_purchases if l_none else 0
    )
    assert sum(r.value_micro for r in first) == sum(
        r.value_micro for r in last
    )


def test_linkpred_lsh_recalls_exact_top_pairs(spark):
    """The LSH escalation must recall the exact query's top pairs: on
    this fixture the strongest neighborhoods collide in at least one
    band, so the top-10 exact pairs must all survive, and every
    reported (n_common, jaccard) must equal the exact query's value
    for the same pair (verification is exact, never the estimate)."""
    from flights_etl_pipeline_spark.plans.queries_graph import (
        copurchase_linkpred,
        copurchase_linkpred_lsh,
    )

    exact = {
        (r.cust_a, r.cust_b): (r.n_common, r.jaccard)
        for r in copurchase_linkpred(spark, SF_DIR).collect()
    }
    lsh = {
        (r.cust_a, r.cust_b): (r.n_common, r.jaccard)
        for r in copurchase_linkpred_lsh(spark, SF_DIR).collect()
    }
    exact_top10 = sorted(
        exact.items(), key=lambda kv: (-kv[1][1], kv[0])
    )[:10]
    missed = [k for k, _ in exact_top10 if k not in lsh]
    assert not missed, f"LSH missed exact top-10 pairs: {missed}"
    for pair, vals in lsh.items():
        if pair in exact:
            assert vals == exact[pair], pair
