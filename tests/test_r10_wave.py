"""Mechanism tests for the round-10 operator wave: containment dedup,
Naive Bayes classification, SCD2 intervals, Neyman allocation, and
sequential pattern mining. Value parity is pinned by the DuckDB oracles;
these tests pin the SEMANTIC invariants the oracles alone can't state.
"""
from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _q(spark, name):
    from flights_etl_pipeline_spark.plans.registry import REGISTRY
    import flights_etl_pipeline_spark.plans.queries  # noqa: F401

    return REGISTRY[name].fn(spark, SF_DIR)


def test_containment_flags_subset_docs_asymmetrically(spark):
    """Every emitted pair must name the smaller shingle set as the
    contained doc (ties -> least id); planted exact copies
    (doc_id+10000) surface at containment 1.0; and at least one
    STRICTLY asymmetric pair (n_a != n_b, i.e. a doc inside a larger
    doc — the case Jaccard under-scores) must be present. The planted
    near-copies rank below the 1.0-tie top-k cut at this SF, so the
    asymmetry evidence comes from the corpus's organic subset pairs."""
    rows = _q(spark, "shingle_containment_pairs").collect()
    assert rows, "containment query returned nothing"
    for r in rows:
        assert r["containment"] >= 0.9
        if r["n_a"] < r["n_b"]:
            assert r["contained_doc"] == r["doc_a"]
        elif r["n_b"] < r["n_a"]:
            assert r["contained_doc"] == r["doc_b"]
        else:
            assert r["contained_doc"] == min(r["doc_a"], r["doc_b"])
    exact = [r for r in rows if r["doc_b"] == r["doc_a"] + 10000]
    assert exact, "no planted exact-copy pairs surfaced"
    for r in exact:
        assert r["containment"] == 1.0 and r["n_a"] == r["n_b"]
    assert any(r["n_a"] != r["n_b"] for r in rows), (
        "no asymmetric (doc-in-doc) pair surfaced"
    )


def test_nb_classifier_confusion_is_complete_and_train_closed(spark):
    """The confusion matrix must cover every test doc exactly once and
    only ever predict languages seen in training (the model cannot
    invent a class)."""
    from flights_etl_pipeline_spark.plans.queries_ml import split_assign
    from flights_etl_pipeline_spark.plans.registry import load

    docs = load(spark, SF_DIR, "documents").withColumn(
        "split", split_assign("doc_id")
    )
    n_test = docs.filter(F.col("split") == "test").count()
    train_langs = {
        r["lang"]
        for r in docs.filter(F.col("split") == "train")
        .select("lang")
        .distinct()
        .collect()
    }
    rows = _q(spark, "naive_bayes_lang_classifier").collect()
    assert sum(r["n_docs"] for r in rows) == n_test
    assert {r["pred_lang"] for r in rows} <= train_langs
    # better than uniform-random on the diagonal (weak but real signal)
    acc = sum(
        r["n_docs"] for r in rows if r["true_lang"] == r["pred_lang"]
    ) / n_test
    assert acc > 1.0 / (len(train_langs) + 1)


def test_scd2_intervals_tile_each_user_history(spark):
    """Per user: intervals are disjoint and contiguous (each valid_to
    equals the next valid_from), exactly one open (is_current) row, no
    two consecutive intervals share a state, and n_events sums to the
    user's event count."""
    from flights_etl_pipeline_spark.plans.registry import load

    out = _q(spark, "scd2_user_state_history")
    rows = out.orderBy("user_id", "valid_from").collect()
    ev_counts = dict(
        load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .count()
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == set(ev_counts)
    for uid, ivs in by_user.items():
        assert sum(r["n_events"] for r in ivs) == ev_counts[uid]
        assert sum(1 for r in ivs if r["is_current"]) == 1
        assert ivs[-1]["is_current"] and ivs[-1]["valid_to"] is None
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["event_type"] != b["event_type"]


def test_neyman_allocation_respects_budget_and_favors_variance(spark):
    from flights_etl_pipeline_spark.plans.queries_ml import _NEY_BUDGET

    rows = _q(spark, "neyman_stratified_sample").collect()
    assert rows
    assert sum(r["n_alloc"] for r in rows) <= _NEY_BUDGET
    for r in rows:
        assert 0 <= r["n_alloc"] <= r["n_total"]
        # the rank draw fills the allocation exactly (n_alloc <= N_h)
        assert r["n_sampled"] == r["n_alloc"]
    # allocation ordering follows the Neyman weight ordering
    by_w = sorted(rows, key=lambda r: -r["w_q"])
    allocs = [r["n_alloc"] for r in by_w]
    assert all(a >= b - 1 for a, b in zip(allocs, allocs[1:])), (
        "higher Neyman weight must never get a materially smaller "
        "allocation"
    )


def test_sequence_mining_support_and_counts_are_consistent(spark):
    from flights_etl_pipeline_spark.plans.registry import load

    rows = _q(spark, "event_sequence_mining").collect()
    assert rows
    total_users = (
        load(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    prev = None
    for r in rows:
        assert 1 <= r["n_users"] <= r["n_occurrences"]
        assert 0 < r["support"] <= 1
        assert r["n_users"] <= total_users
        if prev is not None:  # ranked by user support, descending
            assert r["n_users"] <= prev
        prev = r["n_users"]


def test_isotonic_calibration_is_monotone_and_mean_preserving(spark):
    """The PAV fit must be monotone non-decreasing in the score bucket,
    bounded by [0, 1], and preserve the GLOBAL positive rate under
    count weighting (a property of the exact least-squares isotonic
    solution; the minimax formula must reproduce it)."""
    rows = sorted(
        _q(spark, "quality_isotonic_calibration").collect(),
        key=lambda r: r["bucket"],
    )
    assert rows
    prev = -1.0
    for r in rows:
        assert 0.0 <= r["iso_calibrated"] <= 1.0
        assert r["iso_calibrated"] >= prev - 1e-12
        prev = r["iso_calibrated"]
    n = sum(r["n_docs"] for r in rows)
    pos = sum(r["n_pos"] for r in rows)
    fitted = sum(r["iso_calibrated"] * r["n_docs"] for r in rows)
    assert abs(fitted - pos) / n < 1e-4


def test_binary_hamming_matches_bruteforce_top1_and_is_calibrated(spark):
    """Structural guarantees of the Hamming-prefilter serve path: each
    query's own vector is its rank-1 hit at Hamming 0 / cosine 1.0;
    ranks are dense 1..K per query; and candidates all sit at or below
    the query's Hamming threshold by construction (monotone: rank-1 has
    the minimum Hamming among emitted rows)."""
    from flights_etl_pipeline_spark.plans.queries_simsearch import (
        _BH_K,
        _BH_Q,
    )

    rows = _q(spark, "ann_binary_hamming_topk").collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == set(range(_BH_Q))
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, _BH_K + 1))
        assert rs[0]["vec_id"] == qid  # self-hit first
        assert rs[0]["ham"] == 0 and rs[0]["cosine"] == 1.0


def test_temperature_weights_flatten_the_distribution(spark):
    """alpha < 1 must move every language's sampled share TOWARD
    uniform: tail languages get boost > 1, the largest language gets
    boost < 1, and the sampled shares sum to ~1."""
    rows = _q(spark, "temperature_sampling_weights").collect()
    assert abs(sum(r["p_sampled"] for r in rows) - 1.0) < 1e-6
    head = max(rows, key=lambda r: r["chars"])
    tail = min(rows, key=lambda r: r["chars"])
    assert head["boost"] < 1.0 < tail["boost"]
    # order preserved: bigger language never samples below a smaller one
    srt = sorted(rows, key=lambda r: -r["chars"])
    shares = [r["p_sampled"] for r in srt]
    assert shares == sorted(shares, reverse=True)


def test_loso_deltas_are_consistent_with_shares(spark):
    """Dropping a source with above-average target share must LOWER the
    metric (delta < 0 means the source pulls toward the target), and
    the deltas must reproduce the one-pass identity from the row's own
    integer sums."""
    rows = _q(spark, "loso_source_impact").collect()
    assert rows
    total = sum(r["chars"] for r in rows)
    tgt_total = sum(r["tgt_chars"] for r in rows)
    full = tgt_total / total
    for r in rows:
        src_share = r["tgt_chars"] / r["chars"]
        without = (tgt_total - r["tgt_chars"]) / (total - r["chars"])
        assert abs(r["metric_without"] - without) < 1e-5
        if src_share > full:
            assert r["delta"] < 0
        elif src_share < full:
            assert r["delta"] > 0


def test_markov_removal_effects_are_probabilities_and_ordered(spark):
    """Removal effects must be valid probabilities: 0 <= p_without <=
    p_conversion <= 1 (removing a channel can never ADD conversions in
    an absorbing chain), removal_effect in [0, 1], and the identity
    removal_effect = 1 - p_without/p_conversion must hold at the
    quantization scale."""
    rows = _q(spark, "markov_removal_effect").collect()
    assert len(rows) == 4
    for r in rows:
        assert 0.0 <= r["p_without"] <= r["p_conversion"] <= 1.0
        assert 0.0 <= r["removal_effect"] <= 1.0
        want = 1.0 - r["p_without"] / r["p_conversion"]
        assert abs(r["removal_effect"] - want) < 2e-6


def test_good_turing_spectrum_identities(spark):
    """N_r must be positive, r_star present wherever N_(r+1) exists,
    and p_unseen = N_1 / total tokens exactly (recomputed from the
    spectrum itself)."""
    rows = sorted(_q(spark, "vocab_good_turing").collect(),
                  key=lambda r: r["r"])
    assert rows and rows[0]["r"] >= 1
    n1 = next((r["n_r"] for r in rows if r["r"] == 1), 0)
    assert n1 > 0, "trigram spectrum must have a singleton band"
    p0 = rows[0]["p_unseen"]
    assert all(r["p_unseen"] == p0 for r in rows)
    assert 0 < p0 < 1
    by_r = {r["r"]: r for r in rows}
    for r in rows:
        if (r["r"] + 1) in by_r:
            want = (r["r"] + 1) * by_r[r["r"] + 1]["n_r"] / r["n_r"]
            assert abs(r["r_star"] - want) < 1e-5


def test_stratified_att_is_weighted_mean_of_diffs(spark):
    """The ATT must be the treated-weighted mean of per-bucket diffs,
    and every emitted bucket must have both groups."""
    rows = _q(spark, "events_stratified_att").collect()
    assert rows
    att = rows[0]["att"]
    assert all(r["att"] == att for r in rows)
    nt = sum(r["n_t"] for r in rows)
    want = sum(r["diff"] * r["n_t"] for r in rows) / nt
    assert abs(att - want) < 1e-4
    for r in rows:
        assert r["n_t"] > 0 and r["n_c"] > 0
        assert abs(r["diff"] - (r["mean_t"] - r["mean_c"])) < 2e-6


def test_ndcg_bounds_and_recall_consistency(spark):
    """NDCG must be in [0, 1]; a query whose LSH bucket contains the
    entire true top-k (recall 1.0 with identical ordering) would score
    ndcg 1.0 -- in general ndcg <= 1 with equality iff dcg == idcg."""
    rows = _q(spark, "ann_ndcg_eval").collect()
    assert len(rows) == 10
    for r in rows:
        assert 0.0 <= r["dcg"] <= r["idcg"] + 1e-9
        assert r["ndcg"] is None or 0.0 <= r["ndcg"] <= 1.0
        if r["ndcg"] == 1.0:
            assert abs(r["dcg"] - r["idcg"]) < 2e-6


def test_bot_screen_flags_match_cv_rule(spark):
    from flights_etl_pipeline_spark.plans.queries_events import (
        _BOT_CV_FLAG,
        _BOT_MIN_GAPS,
    )

    rows = _q(spark, "events_bot_screen").collect()
    assert rows
    for r in rows:
        assert r["n_gaps"] >= _BOT_MIN_GAPS
        assert r["mean_gap_sec"] > 0
        if r["cv"] is not None:
            assert r["is_bot_like"] == (r["cv"] < _BOT_CV_FLAG)


def test_decayed_frequency_bounds(spark):
    """decayed_score <= n_total (weights <= 1), freshness in (0, 1],
    and a type whose events all landed on the anchor day would have
    freshness 1 -- in general freshness strictly below 1 once any
    event is older than the anchor."""
    rows = _q(spark, "events_decayed_frequency").collect()
    assert rows
    for r in rows:
        assert 0 < r["decayed_score"] <= r["n_total"] + 1e-9
        assert 0 < r["freshness"] <= 1.0


def test_disorder_profile_is_a_cumulative_distribution(spark):
    rows = sorted(_q(spark, "events_disorder_profile").collect(),
                  key=lambda r: r["bucket"])
    assert rows
    total_share = sum(r["share"] for r in rows)
    assert abs(total_share - 1.0) < 1e-4
    prev = 0.0
    for r in rows:
        assert r["cum_share"] >= prev - 1e-9
        prev = r["cum_share"]
    assert abs(rows[-1]["cum_share"] - 1.0) < 1e-6


def test_funnel_latency_quantiles_are_ordered(spark):
    rows = _q(spark, "events_funnel_latency").collect()
    steps = {r["step"] for r in rows}
    assert steps <= {"view_to_click", "click_to_purchase"}
    for r in rows:
        assert r["n_users"] > 0
        assert 0 <= r["median_sec"] <= r["p90_sec"]


def test_stickiness_bounds_and_identity(spark):
    """1/n_days <= stickiness <= 1 (a monthly user is active on at
    least one of the month's observed days), and dau_sum/mau must be
    internally consistent."""
    rows = _q(spark, "events_dau_mau_stickiness").collect()
    assert rows
    for r in rows:
        assert r["mau"] > 0 and r["n_days"] > 0
        lo = 1.0 / r["n_days"] - 1e-9
        assert lo <= r["stickiness"] <= 1.0 + 1e-9
        want = r["dau_sum"] / r["n_days"] / r["mau"]
        assert abs(r["stickiness"] - want) < 1e-5


def test_supplier_sla_quantiles_and_rates(spark):
    rows = _q(spark, "supplier_fulfillment_sla").collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_late"] <= r["n_lines"]
        assert abs(r["late_rate"] - r["n_late"] / r["n_lines"]) < 1e-5
        assert r["p50_lead_days"] <= r["p90_lead_days"]


def test_dims_profile_covers_all_dimensions(spark):
    rows = _q(spark, "embedding_dims_profile").collect()
    assert sorted(r["dim"] for r in rows) == list(range(64))
    for r in rows:
        assert r["min_val"] <= r["mean_val"] <= r["max_val"]
        assert r["var_val"] >= 0
        assert 0 <= r["zero_share"] <= 1


def test_repeat_curve_is_a_survival_distribution(spark):
    rows = sorted(_q(spark, "orders_repeat_purchase_curve").collect(),
                  key=lambda r: r["orders_bucket"])
    assert rows
    assert abs(sum(r["customer_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["order_share"] for r in rows) - 1.0) < 1e-4
    # share_with_at_least is non-increasing in the bucket and hits 1.0
    # at the smallest bucket
    prev = None
    for r in rows:
        if prev is not None:
            assert r["share_with_at_least"] <= prev + 1e-9
        prev = r["share_with_at_least"]
    assert abs(rows[0]["share_with_at_least"] - 1.0) < 1e-6
