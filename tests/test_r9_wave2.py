"""Round-9 second wave: Theil-Sen robust trend, episode mining,
DP Laplace release, TF-IDF sparse pair similarity.

Each test builds a tiny synthetic fixture whose correct answer is
derivable by hand, so it pins MECHANISM (robustness, ordering
semantics, mechanism arithmetic), not just parity -- parity with
DuckDB is the driver gate's job.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _write(df, path):
    df.write.mode("overwrite").parquet(str(path))


def test_theilsen_ignores_single_corrupt_month(spark, tmp_path):
    """12 months of exactly-linear revenue (slope 100/month) with ONE
    month corrupted by +1e6: OLS would move the slope by thousands;
    the Theil-Sen median slope must stay exactly 100. (The corrupt
    month contributes only 11 of the 66 pairwise slopes -- under the
    29% breakdown point.)"""
    from flights_etl_pipeline_spark.plans.queries_core import (
        theilsen_nation_trend,
    )

    orders = []
    oid = 0
    for m in range(1, 13):  # 1995-01 .. 1995-12, t = m
        rev = 1000.0 + 100.0 * m + (1e6 if m == 7 else 0.0)
        orders.append((oid, 1, rev, dt.date(1995, m, 15)))
        oid += 1
    _write(
        spark.createDataFrame(
            orders,
            "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE, "
            "o_orderdate DATE",
        ),
        tmp_path / "orders.parquet",
    )
    _write(
        spark.createDataFrame([(1, 0)], "c_custkey LONG, c_nationkey LONG"),
        tmp_path / "customer.parquet",
    )
    _write(
        spark.createDataFrame([(0, "X")], "n_nationkey LONG, n_name STRING"),
        tmp_path / "nation.parquet",
    )
    rows = theilsen_nation_trend(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_pairs"] == 66
    assert r["ts_slope"] == 100.0, r
    # intercept: median residual at slope 100 -- the 11 clean months
    # all have residual exactly 1000, so the median is 1000 too
    assert r["ts_intercept"] == 1000.0, r


def test_episode_lift_orders_and_ties(spark, tmp_path):
    """Hand-checkable journeys: u1 sees A then B, u2 sees B then A,
    u3 sees A only, u4 sees A and B at the SAME timestamp (event_id
    breaks the tie toward A-before-B)."""
    from flights_etl_pipeline_spark.plans.queries_events import (
        events_episode_lift,
    )

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    ev = [
        (1, t0, 1, "A", 0.0, "{}"),
        (2, t0 + s, 1, "B", 0.0, "{}"),
        (3, t0, 2, "B", 0.0, "{}"),
        (4, t0 + s, 2, "A", 0.0, "{}"),
        (5, t0, 3, "A", 0.0, "{}"),
        (6, t0, 4, "A", 0.0, "{}"),  # same ts as event 7, lower id
        (7, t0, 4, "B", 0.0, "{}"),
    ]
    _write(
        spark.createDataFrame(
            ev,
            "event_id LONG, ts TIMESTAMP, user_id LONG, "
            "event_type STRING, value DOUBLE, props STRING",
        ),
        tmp_path / "events.parquet",
    )
    got = {
        (r["type_a"], r["type_b"]): r
        for r in events_episode_lift(spark, str(tmp_path)).collect()
    }
    # A-before-B: u1 and u4 (tie broken by event_id) -> 2
    assert got[("A", "B")]["n_ab"] == 2
    # B-before-A: u2 only
    assert got[("B", "A")]["n_ab"] == 1
    # marginals: A first-occurs for 4 users, B for 3; n_users = 4
    assert got[("A", "B")]["confidence"] == 0.5  # 2/4
    assert got[("A", "B")]["lift"] == round(2 * 4 / (4 * 3), 6)
    assert got[("B", "A")]["confidence"] == round(1 / 3, 6)


def test_dp_laplace_mechanism_invariants(spark, sf_dir):
    """The released noisy count must decompose exactly as
    n_true + noise; noise is bounded by the eps=1 inverse-CDF range
    (|ln 1e-15| ~ 34.5); the seeded draw is deterministic across runs
    and distinct across groups (hash-seeded, not constant)."""
    from flights_etl_pipeline_spark.plans.queries_ml import (
        dp_laplace_event_counts,
    )

    rows1 = sorted(
        dp_laplace_event_counts(spark, sf_dir).collect(),
        key=lambda r: r["event_type"],
    )
    rows2 = sorted(
        dp_laplace_event_counts(spark, sf_dir).collect(),
        key=lambda r: r["event_type"],
    )
    assert [tuple(r) for r in rows1] == [tuple(r) for r in rows2]
    noises = set()
    for r in rows1:
        assert r["noisy_n"] == r["n_true"] + r["noise"], r
        assert abs(r["noise"]) <= 35.0, r
        noises.add(r["noise"])
    assert len(noises) == len(rows1), "hash-seeded noise must vary by key"


def test_tfidf_cosine_identical_docs_and_df_cut(spark, tmp_path):
    """doc 1 == doc 2 exactly -> cosine 1.0 at the top; doc 3 shares
    no trigram with anything (its df=1 shingles are cut before the
    join, so it appears in NO pair); doc 4 overlaps docs 1/2 partially
    -> 0 < cos < 1."""
    from flights_etl_pipeline_spark.plans.queries_text import (
        tfidf_cosine_topk,
    )

    docs = [
        (1, "a b c d e", "en", "web", 9),
        (2, "a b c d e", "en", "web", 9),
        (3, "x y z w v u", "en", "web", 11),
        (4, "a b c q r s t", "en", "web", 13),
    ]
    _write(
        spark.createDataFrame(
            docs,
            "doc_id LONG, text STRING, lang STRING, source STRING, "
            "n_chars LONG",
        ),
        tmp_path / "documents.parquet",
    )
    rows = tfidf_cosine_topk(spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert set(pairs) == {(1, 2), (1, 4), (2, 4)}
    assert pairs[(1, 2)]["cos_sim"] == 1.0
    assert pairs[(1, 2)]["n_shared"] == 3  # a b c / b c d / c d e
    assert 0.0 < pairs[(1, 4)]["cos_sim"] < 1.0
    # symmetric overlap: (1,4) and (2,4) must score identically
    assert pairs[(1, 4)]["cos_sim"] == pairs[(2, 4)]["cos_sim"]
    assert rows[0]["cos_sim"] == max(r["cos_sim"] for r in rows)


def test_kcore_cascading_peel_and_cycle_survives(spark, tmp_path, monkeypatch):
    """K=2 hand graph: a 4+4 bipartite cycle (every node degree 2 --
    a 2-core, must survive whole) with a 3-segment tail (degree-1 end
    peels first, the cascade removes the tail layer by layer over
    multiple rounds). Pins the multi-round peel mechanism and that
    peeling STOPS at the core instead of eroding it."""
    import flights_etl_pipeline_spark.plans.queries_graph as g

    monkeypatch.setattr(g, "_KCORE_K", 2)
    # bipartite cycle c1-s1-c2-s2-c3-s3-c4-s4-c1 plus tail s4-c5-s5-c6
    edges = [
        (1, 1), (2, 1), (2, 2), (3, 2), (3, 3), (4, 3), (4, 4), (1, 4),
        (5, 4),  # c5 in tail, shares s4 with the cycle
        (5, 5),  # c5-s5
        (6, 5),  # c6-s5; c6 degree 1 -> peels, then s5, then c5's edge
    ]
    orders = [(i, c) for i, (c, _s) in enumerate(edges)]
    li = [(i, s) for i, (_c, s) in enumerate(edges)]
    orders_df = spark.createDataFrame(orders, "o_orderkey LONG, o_custkey LONG")
    li_df = spark.createDataFrame(li, "l_orderkey LONG, l_suppkey LONG")
    orders_df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    li_df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    rows = g.copurchase_kcore(spark, str(tmp_path)).collect()
    got = {(r["node_type"], r["node"]): r["deg_core"] for r in rows}
    expect = {("customer", c): 2 for c in (1, 2, 3, 4)}
    expect.update({("supplier", s): 2 for s in (1, 2, 3, 4)})
    assert got == expect, got


def test_kcore_real_fixture_invariant(spark, sf_dir):
    """Every surviving node's in-core degree >= K, and the peel is
    non-trivial on the fixture (some nodes removed)."""
    import flights_etl_pipeline_spark.plans.queries_graph as g

    rows = g.copurchase_kcore(spark, sf_dir).collect()
    assert rows, "core must be non-empty at K=8 on sf0.001"
    assert all(r["deg_core"] >= g._KCORE_K for r in rows)
    n_customers = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    n_core_cust = sum(1 for r in rows if r["node_type"] == "customer")
    assert n_core_cust < n_customers, "peel must remove someone"


def test_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    """CI must bracket the full-sample mean, replicate determinism must
    hold across invocations, and the point estimate must equal the
    directly computed mean."""
    from flights_etl_pipeline_spark.plans.queries_profile import (
        revenue_bootstrap_ci,
    )

    r1 = revenue_bootstrap_ci(spark, sf_dir).collect()[0]
    r2 = revenue_bootstrap_ci(spark, sf_dir).collect()[0]
    assert tuple(r1) == tuple(r2)
    assert r1["ci_lo"] <= r1["est_mean"] <= r1["ci_hi"], r1
    assert r1["ci_lo"] < r1["ci_hi"]
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    direct = orders.agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
         / F.count(F.lit(1))).alias("m")
    ).collect()[0]["m"]
    import math

    assert r1["est_mean"] == math.floor(direct * 10000 + 0.5) / 10000


def test_ohlc_stream_equals_batch_twin(spark, sf_dir):
    """The watermarked append-mode OHLC stream must reproduce the batch
    events_ohlc_hourly bars exactly (same packed-ordk min_by/max_by),
    modulo column naming/order."""
    from flights_etl_pipeline_spark.plans.queries_events import (
        events_ohlc_hourly,
    )
    from flights_etl_pipeline_spark.plans.queries_streaming import (
        events_ohlc_stream,
    )

    batch = {
        (r["event_type"], r["hour_start"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"]
        )
        for r in events_ohlc_hourly(spark, sf_dir).collect()
    }
    stream = {
        (r["event_type"], r["hour_start"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"]
        )
        for r in events_ohlc_stream(spark, sf_dir).collect()
    }
    assert stream == batch


def test_mmr_skips_redundant_near_duplicate(spark, tmp_path):
    """Corpus where the two most relevant hits are near-duplicates of
    each other: pure relevance ranks them 1-2, but MMR must demote the
    redundant twin below a less-relevant-but-diverse vector."""
    import flights_etl_pipeline_spark.plans.queries_simsearch as ss

    dim = 8

    def vec(*pairs):
        v = [0.0] * dim
        for i, x in pairs:
            v[i] = x
        return v

    # unit vectors; e1/e2 nearly identical (sim ~.99999), e3 relevant
    # but pointing elsewhere off-axis: mmr(e2|{0,1}) = .7*.949 -
    # .3*.99999 = .364 < mmr(e3|{0,1}) = .7*.94 - .3*.94 = .376
    rows = [
        (0, vec((0, 1.0)), "q"),                            # the query
        (1, vec((0, 0.95), (1, 0.31225)), "dupA"),
        (2, vec((0, 0.949), (1, 0.31528)), "dupB"),         # ~dup of 1
        (3, vec((0, 0.94), (2, 0.34117)), "diverse"),
        (4, vec((3, 1.0)), "orthogonal"),                   # irrelevant
    ]
    spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label STRING"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {r["rank"]: r for r in ss.ann_mmr_rerank(spark, str(tmp_path)).collect()}
    assert out[1]["vec_id"] == 0          # query is its own top hit
    assert out[2]["vec_id"] == 1          # most relevant non-self
    # relevance order would put 2 next; MMR must pick the diverse 3
    assert out[3]["vec_id"] == 3, out
    assert out[4]["vec_id"] == 2
    # mmr scores strictly ordered within the greedy schedule's picks
    assert out[2]["mmr_score"] >= out[3]["mmr_score"]


def test_fellegi_sunter_separates_match_class(spark, sf_dir):
    """EM must discover the injected twin class: the name feature
    (agreeing on virtually no non-match pair) gets a large positive
    log2(m/u) weight, far above the segment feature (agrees on ~1/5 of
    random pairs); the match prior stays small (twins are a sliver of
    the blocked pair space); all parameters stay inside the clamp."""
    from flights_etl_pipeline_spark.plans.queries_dedup import (
        fellegi_sunter_em,
    )

    rows = {r["feature"]: r for r in fellegi_sunter_em(spark, sf_dir).collect()}
    assert set(rows) == {"name_eq", "seg_eq", "bal_exact", "bal_close"}
    for r in rows.values():
        assert 0.0 < r["m"] < 1.0 and 0.0 < r["u"] < 1.0
        assert r["p_match"] == rows["name_eq"]["p_match"]
    assert rows["name_eq"]["weight"] > 5.0
    assert rows["name_eq"]["weight"] > rows["seg_eq"]["weight"] + 3.0
    assert rows["name_eq"]["m"] > 0.5
    assert rows["name_eq"]["u"] < 0.01
    # at the smoke SF the 99 injected twins are ~7.5% of the blocked
    # pair space; the prior must sit near that, far from the 0.9 m's
    assert rows["name_eq"]["p_match"] < 0.2


def test_watermark_flags_green_biased_text(spark, tmp_path):
    """A doc constructed by always choosing a green continuation must
    z-score at +sqrt(n); ordinary text stays near 0."""
    import hashlib

    from flights_etl_pipeline_spark.plans.queries_text import (
        _WM_SEED,
        watermark_greenlist_score,
    )

    vocab = [chr(ord("a") + i) for i in range(10)]

    def is_green(prev, tok):
        h = hashlib.md5(f"{prev}|{tok}|{_WM_SEED}".encode()).hexdigest()
        return int(h[:15], 16) % 2 == 0

    toks = ["a"]
    for _ in range(60):
        toks.append(next(t for t in vocab if is_green(toks[-1], t)))
    wm_text = " ".join(toks)
    nat_text = " ".join(vocab * 6 + ["a"])
    docs = [
        (1, wm_text, "en", "gen", len(wm_text)),
        (2, nat_text, "en", "web", len(nat_text)),
    ]
    spark.createDataFrame(
        docs,
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in watermark_greenlist_score(spark, str(tmp_path)).collect()
    }
    assert rows[1]["n_pairs"] == 60
    assert rows[1]["n_green"] == 60  # every continuation chosen green
    assert rows[1]["z_score"] == round(60**0.5, 6) or abs(
        rows[1]["z_score"] - 60**0.5
    ) < 1e-6
    assert abs(rows[2]["z_score"]) < 3.0, rows[2]


def test_l_diversity_homogeneous_group_flagged(spark, tmp_path):
    """Group A holds ONE balance band (l=1 -- homogeneity leak) while
    group B spans all ten; A's t-closeness is hand-computable: 0.45
    against the 20-row global distribution."""
    from flights_etl_pipeline_spark.plans.queries_ml import (
        l_diversity_audit,
    )

    rows = [(i, f"c{i}", 0, 500.0 + 0.0, "X") for i in range(10)]
    rows += [
        (100 + i, f"d{i}", 1, 500.0 + 1000.0 * (i % 10), "X")
        for i in range(20)
    ]
    spark.createDataFrame(
        rows,
        "c_custkey LONG, c_name STRING, c_nationkey INT, "
        "c_acctbal DOUBLE, c_mktsegment STRING",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    out = {
        (r["nat"], r["seg"]): r
        for r in l_diversity_audit(spark, str(tmp_path)).collect()
    }
    a, b = out[(0, "X")], out[(1, "X")]
    assert a["l_diversity"] == 1 and a["n_rows"] == 10
    assert b["l_diversity"] == 10 and b["n_rows"] == 20
    # t(A): (|1 - 12/30| + 9 * |0 - 2/30|) / 2 = 0.6
    # t(B): (|1/10 - 12/30| + 9 * |1/10 - 2/30|) / 2 = 0.3
    assert abs(a["t_closeness"] - 0.6) < 1e-8
    assert abs(b["t_closeness"] - 0.3) < 1e-8
    assert b["t_closeness"] < a["t_closeness"]


def test_backtest_perfect_seasonality_zero_smape(spark, tmp_path):
    """24 months with EXACT 12-month seasonality: the seasonal-naive
    forecaster is perfect, so sMAPE and MAE must both be exactly 0
    over the 12 evaluated months."""
    from flights_etl_pipeline_spark.plans.queries_core import (
        revenue_backtest_smape,
    )

    orders = []
    oid = 0
    for y in (1995, 1996):
        for m in range(1, 13):
            orders.append((oid, 1, 1000.0 + 37.0 * m, dt.date(y, m, 10)))
            oid += 1
    _write(
        spark.createDataFrame(
            orders,
            "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE, "
            "o_orderdate DATE",
        ),
        tmp_path / "orders.parquet",
    )
    _write(
        spark.createDataFrame([(1, 0)], "c_custkey LONG, c_nationkey LONG"),
        tmp_path / "customer.parquet",
    )
    _write(
        spark.createDataFrame([(0, "X")], "n_nationkey LONG, n_name STRING"),
        tmp_path / "nation.parquet",
    )
    rows = revenue_backtest_smape(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_evals"] == 12
    assert r["mae"] == 0.0 and r["smape"] == 0.0


def test_conformal_coverage_near_nominal(spark, sf_dir):
    """Split-conformal realized coverage must sit near the 90% nominal
    level on held-out data (the distribution-free guarantee is >=90%
    in expectation; a fixture realization can dip slightly below)."""
    from flights_etl_pipeline_spark.plans.queries_ml import (
        conformal_order_intervals,
    )

    rows = conformal_order_intervals(spark, sf_dir).collect()
    assert rows, "must emit one row per segment"
    for r in rows:
        assert r["q_hat"] > 0
        assert r["n_cal"] > 0 and r["n_test"] > 0
        assert 0.80 <= r["coverage"] <= 1.0, r


def test_zscore_stream_cross_batch_state_and_var_guard(spark, tmp_path):
    """User 2's anomaly arrives in the LAST replay chunk while the
    prior moments accumulated in earlier micro-batches -- flagging it
    proves state carries across batches. User 1 is constant-valued:
    var == 0, and the var > 0 guard must keep the zero-deviation rows
    from false-flagging."""
    from flights_etl_pipeline_spark.streaming.jobs import events_zscore_stream

    t0 = dt.datetime(2024, 3, 1)
    ev = []
    eid = 0
    vals2 = [10.0, 12.0, 11.0, 10.0, 12.0, 11.0, 100.0]
    for i in range(7):
        ev.append((eid, t0 + dt.timedelta(minutes=i), 1, "view", 10.0, "{}"))
        eid += 1
        ev.append(
            (eid, t0 + dt.timedelta(minutes=i, seconds=30), 2, "view",
             vals2[i], "{}")
        )
        eid += 1
    _write(
        spark.createDataFrame(
            ev,
            "event_id LONG, ts TIMESTAMP, user_id LONG, "
            "event_type STRING, value DOUBLE, props STRING",
        ),
        tmp_path / "events.parquet",
    )
    rows = events_zscore_stream(spark, str(tmp_path)).collect()
    flagged = {(r["user_id"], r["event_id"]): r for r in rows}
    # user 2's 100.0 (event_id 13, 6 priors) must be the only flag
    assert set(flagged) == {(2, 13)}, flagged
    assert flagged[(2, 13)]["n_prior"] == 6


def test_purged_cv_embargo_accounting(spark, sf_dir):
    """Every order lands in exactly one bucket per fold
    (test + train + embargoed == total), test blocks partition the
    data across folds, and the embargo actually removes rows (interior
    folds must embargo > 0)."""
    from flights_etl_pipeline_spark.plans.queries_ml import purged_cv_folds

    total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    rows = purged_cv_folds(spark, sf_dir).collect()
    assert len(rows) == 5
    assert sum(r["n_test"] for r in rows) == total
    for r in rows:
        assert r["n_test"] + r["n_train"] + r["n_embargoed"] == total
    assert sum(r["n_embargoed"] for r in rows) > 0


def test_agms_estimator_reasonable_and_deterministic(spark, sf_dir):
    """The tug-of-war estimate must sit within the ~1/sqrt(16)
    relative-error regime of the exact F2 (loose 3x slack), and the
    seeded sketch must reproduce bit-identically."""
    from flights_etl_pipeline_spark.plans.queries_profile import (
        lineitem_f2_agms,
    )

    r1 = lineitem_f2_agms(spark, sf_dir).collect()[0]
    r2 = lineitem_f2_agms(spark, sf_dir).collect()[0]
    assert tuple(r1) == tuple(r2)
    assert r1["exact_f2"] > 0
    assert r1["rel_err"] < 0.75  # 3x the 1/sqrt(16) = 0.25 regime
    assert abs(r1["est_f2"] / r1["exact_f2"] - 1.0) - r1["rel_err"] < 1e-4


def test_hill_alpha_recovers_pareto_exponent(spark, tmp_path):
    """Synthetic Pareto(alpha=2) sample via inverse CDF on a uniform
    grid: the Hill estimate over the top-100 must land near 2."""
    from flights_etl_pipeline_spark.plans.queries_profile import (
        order_value_hill_tail,
    )

    n = 2000
    rows = [
        (i, 1, 100.0 * (1.0 - (i + 0.5) / n) ** (-1.0 / 2.0))
        for i in range(n)
    ]
    spark.createDataFrame(
        rows, "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = order_value_hill_tail(spark, str(tmp_path)).collect()[0]
    assert r["k"] == 100
    assert 1.6 < r["hill_alpha"] < 2.5, r


def test_median_ci_brackets_median_and_orders(spark, sf_dir):
    """Per segment: ci_lo <= median <= ci_hi, the interval is
    non-degenerate, and n matches the join cardinality."""
    from flights_etl_pipeline_spark.plans.queries_profile import (
        segment_median_rank_ci,
    )

    rows = segment_median_rank_ci(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["ci_lo"] <= r["median"] <= r["ci_hi"], r
        assert r["ci_lo"] < r["ci_hi"]
        assert r["n"] > 0


def test_theil_zero_on_equal_and_positive_on_skew(spark, tmp_path):
    """Equal revenues across nations -> Theil T exactly 0; a skewed
    allocation -> strictly positive."""
    from flights_etl_pipeline_spark.plans.queries_core import (
        nation_revenue_theil_index,
    )

    def build(revs):
        orders = [
            (i, i, float(r), dt.date(1995, 6, 1)) for i, r in enumerate(revs)
        ]
        _write(
            spark.createDataFrame(
                orders,
                "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE, "
                "o_orderdate DATE",
            ),
            tmp_path / "orders.parquet",
        )
        _write(
            spark.createDataFrame(
                [(i, i) for i in range(len(revs))],
                "c_custkey LONG, c_nationkey LONG",
            ),
            tmp_path / "customer.parquet",
        )
        _write(
            spark.createDataFrame(
                [(i, f"N{i}") for i in range(len(revs))],
                "n_nationkey LONG, n_name STRING",
            ),
            tmp_path / "nation.parquet",
        )
        return nation_revenue_theil_index(spark, str(tmp_path)).collect()[0]

    eq = build([100.0, 100.0, 100.0, 100.0])
    assert eq["theil_t"] == 0.0
    sk = build([1000.0, 10.0, 10.0, 10.0])
    assert sk["theil_t"] > 0.5


def test_runs_test_detects_trend_vs_alternation(spark, tmp_path):
    """A perfectly alternating daily series has the maximum run count
    (z >> 0); a two-block trending series has 2 runs (z << 0)."""
    from flights_etl_pipeline_spark.plans.queries_core import orders_runs_test

    def build(vals):
        orders = [
            (i, 1, float(v), dt.date(1995, 1, 1) + dt.timedelta(days=i))
            for i, v in enumerate(vals)
        ]
        _write(
            spark.createDataFrame(
                orders,
                "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE, "
                "o_orderdate DATE",
            ),
            tmp_path / "orders.parquet",
        )
        return orders_runs_test(spark, str(tmp_path)).collect()[0]

    alt = build([10.0, 100.0] * 10)
    assert alt["runs"] == alt["n1"] + alt["n2"]  # maximum possible
    assert alt["z_stat"] > 3.0
    trend = build([10.0] * 10 + [100.0] * 10)
    assert trend["runs"] == 2
    assert trend["z_stat"] < -3.0
