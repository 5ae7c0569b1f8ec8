"""bench.py's 10x fixture builders are measurement infrastructure with
no oracle of their own — a replication bug would silently corrupt every
sf1_spot slope. Pin the invariants the slopes rely on:

- each table replicates exactly _SF1_REPLICAS times;
- id uniqueness survives (the shift is a multiple of the key domain);
- lineitem shifts by the ORDERS key domain, so the l_orderkey ->
  o_orderkey join has exactly 10x the base cardinality (no orphaned or
  cross-replica matches);
- id-derived modular properties are preserved for dense ids (the
  delta-split `vec_id % 10` used by the ANN spots keeps its share).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import bench

SF_DIR = "/root/testdata/sf0.001"


def test_sf1_fixture_replication_invariants(spark):
    out = bench._sf1_docs_dir(spark, SF_DIR)
    r = bench._SF1_REPLICAS
    for table, shifts in bench._SF1_TABLES.items():
        base = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
        big = spark.read.parquet(os.path.join(out, f"{table}.parquet"))
        n_base, n_big = base.count(), big.count()
        assert n_big == r * n_base, table
        for idcol, _domain in shifts:
            # every shifted column's replica domains are disjoint: its
            # distinct count scales exactly with the replicas, and a
            # column that was unique in the base stays unique
            b_distinct = base.select(idcol).distinct().count()
            n_distinct = big.select(idcol).distinct().count()
            assert n_distinct == r * b_distinct, (
                f"{table}: replica shift collided {idcol} values"
            )
            if b_distinct == n_base:
                assert n_distinct == n_big, (
                    f"{table}: {idcol} lost uniqueness under the shift"
                )

    # join consistency: every replicated order keeps exactly its own
    # lineitems — joined cardinality is exactly 10x the base join
    b_orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    b_li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    base_join = b_orders.join(
        b_li, b_orders.o_orderkey == b_li.l_orderkey
    ).count()
    g_orders = spark.read.parquet(os.path.join(out, "orders.parquet"))
    g_li = spark.read.parquet(os.path.join(out, "lineitem.parquet"))
    big_join = g_orders.join(
        g_li, g_orders.o_orderkey == g_li.l_orderkey
    ).count()
    assert big_join == bench._SF1_REPLICAS * base_join

    # the copurchase GRAPH must genuinely grow: o_custkey / l_suppkey
    # shift by their own domains, so the distinct (customer, supplier)
    # edge set is 10 disjoint copies of the base graph — the invariant
    # the linkpred sf1 slope measures (without it, distinct() collapses
    # the replicas and the slope only sees the ingest join)
    base_edges = (
        b_orders.join(b_li, b_orders.o_orderkey == b_li.l_orderkey)
        .select("o_custkey", "l_suppkey").distinct().count()
    )
    big_edges = (
        g_orders.join(g_li, g_orders.o_orderkey == g_li.l_orderkey)
        .select("o_custkey", "l_suppkey").distinct().count()
    )
    assert big_edges == bench._SF1_REPLICAS * base_edges

    # modular property used by the ANN delta spots: the delta share of
    # vec_id % 10 == 0 must be identical in base and replicated corpora
    b_emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    g_emb = spark.read.parquet(os.path.join(out, "embeddings.parquet"))
    b_delta = b_emb.filter(F.col("vec_id") % 10 == 0).count()
    g_delta = g_emb.filter(F.col("vec_id") % 10 == 0).count()
    assert g_delta == bench._SF1_REPLICAS * b_delta


def test_centroids_recollect_every_invocation(spark):
    """r12 dropped the fixture-keyed memo (the optimization-round
    contract: every timed run computes from the parquet inputs, so no
    module-level memo of collected intermediates may survive between
    invocations). Two calls must return EQUAL but DISTINCT objects —
    i.e. a genuine re-collect, not a cache hit."""
    from flights_etl_pipeline_spark.plans import queries_simsearch as qs

    a = qs._centroids(spark, SF_DIR)
    b = qs._centroids(spark, SF_DIR)
    assert a == b, "the frozen model must be deterministic"
    assert a is not b, "no memo: each invocation re-collects"
    assert not any(
        "CACHE" in name for name in vars(qs) if name.isupper()
    ), "no module-level result caches may reappear"
    assert len(a) == qs.K_CENTROIDS
    assert [c[0] for c in a] == sorted(c[0] for c in a)


def test_slope_drift_report_flags_median_drift(capsys, tmp_path, monkeypatch):
    """_report_deltas must flag a >1.12x sf1 slope-band MEDIAN drift vs
    the latest committed band record, and prefer a full BENCH_LOCAL
    record over the driver's compact BENCH_r file for the same round
    (VERDICT r9 item 2b)."""
    import json
    import sys as _sys

    import bench as b

    # a fake repo dir with both record shapes for the same round
    (tmp_path / "BENCH_r42.json").write_text(json.dumps(
        {"parsed": {"sf1_scaleup": {"q_a": [1.0, 2.0, 3.0]}}}
    ))
    (tmp_path / "BENCH_LOCAL_r42.json").write_text(json.dumps(
        {"queries": {"q_a": 1.0},
         "sf1_spot": {"queries": {
             "q_a": {"scaleup_band": [1.0, 1.5, 2.0]},
             "q_b": {"scaleup_band": [1.0, 1.0, 1.0]},
         }}}
    ))
    monkeypatch.setattr(
        b.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    rnd, bands = b._baseline_slopes()
    assert rnd == 42
    assert bands["q_a"] == [1.0, 1.5, 2.0], "full local record must win"

    spot = {"queries": {
        "q_a": {"scaleup_band": [1.6, 1.7, 1.8]},   # 1.7/1.5 = 1.13 -> drift
        "q_b": {"scaleup_band": [0.95, 1.05, 1.1]},  # 1.05 -> within bar
    }}
    flagged, drifted = b._report_deltas({}, spot)
    err = capsys.readouterr().err
    assert "SLOPE DRIFT" in err and "q_a" in err
    assert "DRIFTED ['q_a']" in err
    assert "q_b" in err and "DRIFTED ['q_a', 'q_b']" not in err
    # the return value drives the end-of-run isolated re-measure
    # (VERDICT r10 item 2): drifted spots come back to the caller
    assert flagged == [] and drifted == ["q_a"]

    # a >2x headline regression is returned too (baseline r43 carries
    # per-query timings but no bands, so the slope baseline stays r42)
    (tmp_path / "BENCH_r43.json").write_text(json.dumps(
        {"parsed": {"queries": {"q_a": 1.0}}}
    ))
    flagged, _ = b._report_deltas({"q_a": 2.5}, None)
    err = capsys.readouterr().err
    assert "REGRESSION >2x" in err
    assert flagged == ["q_a"]

    # for the same round, the committed quiet local record outranks the
    # driver record — driver records can carry machine-episode walls
    # that would mask genuine regressions (r11 close cycle 1)
    (tmp_path / "BENCH_r44.json").write_text(json.dumps(
        {"parsed": {"queries": {"q_a": 3.0, "q_b": 1.0, "q_c": 1.0,
                                "q_d": 1.0, "q_e": 1.0}}}
    ))
    (tmp_path / "BENCH_LOCAL_r44.json").write_text(json.dumps(
        {"queries": {"q_a": 1.0, "q_b": 1.0, "q_c": 1.0,
                     "q_d": 1.0, "q_e": 1.0}}
    ))
    rnd, prev = b._baseline()
    assert rnd == 44 and prev["q_a"] == 1.0, (
        "quiet local record must outrank the driver record"
    )


def test_episode_remeasure_shapes():
    """The end-of-run self-adjudication must emit {run, isolated} with
    a float pair for headline flags and a band pair for drifted spots,
    and skip drift keys it has no fixture source for (defensive: a
    future organic-variant rename must not crash the bench tail)."""
    import bench as b

    class _W:
        def format(self, *_):
            return self

        def mode(self, *_):
            return self

        def save(self):
            pass

    class _DF:
        write = _W()

    class _Cat:
        def clearCache(self):
            pass

    class _Spark:
        catalog = _Cat()

    def fake_query(spark, sf_dir):
        return _DF()

    qs = {"q_head": fake_query, "q_spot": fake_query}
    timings = {"q_head": 2.5, "q_spot": 1.0}
    spot = {"queries": {"q_spot_organic": {"scaleup_band": [3.0, 3.1, 3.2]}}}
    sources = {"q_spot_organic": ("q_spot", "/unused/by/fake")}
    ep = b._episode_remeasure(
        _Spark(), qs, "/unused", timings, spot, sources,
        flagged=["q_head"], drifted=["q_spot_organic", "renamed_key"],
    )
    assert set(ep) == {"q_head:wall", "q_spot_organic:slope"}
    assert ep["q_head:wall"]["run"] == 2.5
    assert isinstance(ep["q_head:wall"]["isolated"], float)
    assert ep["q_spot_organic:slope"]["run"] == [3.0, 3.1, 3.2]
    iso = ep["q_spot_organic:slope"]["isolated"]
    assert isinstance(iso, list) and len(iso) == 3


def test_episode_keys_dont_collide_for_dual_flagged_query():
    """ADVICE r11: a query that is both headline-flagged (>2x wall)
    and slope-drifted (spot key == query name, e.g. cdc_chunk_dedup)
    must keep BOTH adjudication entries — the namespaced keys prevent
    the drifted band pair from overwriting the headline wall pair."""
    import bench as b

    class _W:
        def format(self, *_):
            return self

        def mode(self, *_):
            return self

        def save(self):
            pass

    class _DF:
        write = _W()

    class _Cat:
        def clearCache(self):
            pass

    class _Spark:
        catalog = _Cat()

    def fake_query(spark, sf_dir):
        return _DF()

    qs = {"q_dual": fake_query}
    timings = {"q_dual": 2.5}
    spot = {"queries": {"q_dual": {"scaleup_band": [3.0, 3.1, 3.2]}}}
    sources = {"q_dual": ("q_dual", "/unused/by/fake")}
    ep = b._episode_remeasure(
        _Spark(), qs, "/unused", timings, spot, sources,
        flagged=["q_dual"], drifted=["q_dual"],
    )
    assert set(ep) == {"q_dual:wall", "q_dual:slope"}
    assert ep["q_dual:wall"]["run"] == 2.5
    assert ep["q_dual:slope"]["run"] == [3.0, 3.1, 3.2]


def test_quiet_ref_reads_latest_local_record(tmp_path, monkeypatch):
    """VERDICT r11 item 3: the emitted quiet_ref must carry the LATEST
    committed BENCH_LOCAL total plus that record's walls for this
    run's worst3 (missing names simply dropped), and be None when no
    quiet record exists (fresh clone)."""
    import json

    import bench as b

    (tmp_path / "BENCH_LOCAL_r10.json").write_text(json.dumps(
        {"value": 48.8, "queries": {"q_a": 1.0, "q_b": 2.0}}
    ))
    (tmp_path / "BENCH_LOCAL_r11.json").write_text(json.dumps(
        {"value": 52.9, "queries": {"q_a": 1.1, "q_b": 2.2}}
    ))
    # driver records must NOT be eligible (they can carry episode walls)
    (tmp_path / "BENCH_r12.json").write_text(json.dumps(
        {"parsed": {"value": 99.0, "queries": {"q_a": 9.0}}}
    ))
    monkeypatch.setattr(
        b.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    ref = b._quiet_ref({"q_b": 3.0, "q_a": 2.0, "q_gone": 1.5})
    assert ref == {
        "total": 52.9,
        "source": "BENCH_LOCAL_r11",
        "worst3": {"q_b": 2.2, "q_a": 1.1},
    }

    empty = tmp_path / "empty"
    empty.mkdir()
    monkeypatch.setattr(
        b.os.path, "abspath", lambda p: str(empty / "bench.py")
    )
    assert b._quiet_ref({"q_a": 1.0}) is None


def test_worst3_tie_breaks_by_name():
    """Equal timings must select and order deterministically by name
    (VERDICT r10 item 6: a 2.985s tie made worst3 order-dependent)."""
    import bench as b

    t = {"zeta": 2.985, "alpha": 2.985, "mid": 3.5, "tiny": 0.1}
    assert list(b._worst3(t)) == ["mid", "alpha", "zeta"]
    # insertion order must not matter
    t2 = dict(reversed(list(t.items())))
    assert list(b._worst3(t2)) == ["mid", "alpha", "zeta"]


def test_vocab_fixture_preserves_df_distribution(spark):
    """The tfidf organic fixture must (a) replicate docs 10x, (b) keep
    doc lengths identical, and (c) preserve the per-term df HISTOGRAM
    exactly (each replica's suffixed vocabulary is a bijection of the
    base vocabulary, so every df bucket's term count multiplies by the
    replica count) — the property that makes the DF cap cut the same
    stopword fraction at 10x."""
    out = bench._sf1_vocab_docs_dir(spark, SF_DIR)
    r = bench._SF1_REPLICAS
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    big = spark.read.parquet(os.path.join(out, "documents.parquet"))
    assert big.count() == r * base.count()
    assert big.select("doc_id").distinct().count() == r * base.count()

    def lengths(df):
        return dict(
            df.select(F.size(F.split("text", " ")).alias("n"))
            .groupBy("n").count().collect()
        )

    bl, gl = lengths(base), lengths(big)
    assert gl == {k: r * v for k, v in bl.items()}

    def df_hist(df):
        words = df.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
        ).distinct()
        return dict(
            words.groupBy("w").count().groupBy("count").agg(
                F.count(F.lit(1)).alias("terms")
            ).collect()
        )

    bh, gh = df_hist(base), df_hist(big)
    assert gh == {k: r * v for k, v in bh.items()}


def test_compact_lines_carry_per_query_map_and_fit_tail():
    """The driver parses the LAST JSON line of a ~2 KB stdout tail; it
    must carry the contract fields AND the per-query map (VERDICT r12
    items 1-2: per_query was empty every round because the map lived
    only in the head-truncated full record)."""
    import json

    import bench as b

    timings = {f"query_name_{i:02d}": 0.5 + i / 100 for i in range(57)}
    worst3 = b._worst3(timings)
    full = {"value": round(sum(timings.values()), 3), "sf": 0.1}
    spot = {
        "queries": {
            f"spot_{i}": {"scaleup_band": [1.0, 1.5, 2.0]} for i in range(29)
        }
    }
    quiet = {"total": 63.355, "source": "BENCH_LOCAL_r12", "worst3": {}}
    episode = {"q:wall": {"run": 3.0, "isolated": 1.0}}
    slopes_line, final_line = b._compact_lines(
        timings, full, worst3, quiet, spot, episode
    )
    assert len(final_line) <= b._TAIL_BUDGET
    parsed = json.loads(final_line)
    for key in ("metric", "value", "unit", "sf", "queries"):
        assert key in parsed, key
    assert parsed["metric"] == "bench_total"
    assert parsed["unit"] == "sec"
    assert parsed["queries"].keys() == timings.keys()
    assert parsed["value"] == full["value"]
    assert parsed["episode_n"] == 1
    assert parsed["quiet_ref"] == {"total": 63.355, "source": "BENCH_LOCAL_r12"}
    slopes = json.loads(slopes_line)
    assert slopes["metric"] == "bench_slopes"
    assert slopes["sf1_scaleup"]["spot_0"] == [1.0, 1.5, 2.0]


def test_compact_final_line_degrades_before_dropping_queries():
    """Self-sizing: with an oversized query set the final line sheds
    precision and derivable fields (worst3, quiet_ref) but NEVER the
    contract fields or the per-query map."""
    import json

    import bench as b

    timings = {f"very_long_query_name_padding_{i:03d}": 1.234 for i in range(80)}
    worst3 = b._worst3(timings)
    full = {"value": 98.72, "sf": 0.1}
    quiet = {"total": 63.355, "source": "BENCH_LOCAL_r12", "worst3": {}}
    _, final_line = b._compact_lines(
        timings, full, worst3, quiet, {"queries": {}}, {}
    )
    parsed = json.loads(final_line)
    assert parsed["queries"].keys() == timings.keys()
    # degraded: centisecond values, derivable fields shed
    assert parsed["queries"]["very_long_query_name_padding_000"] == 1.23
    assert "worst3" not in parsed
