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


def test_changefeed_replays_snapshot1_to_snapshot2(spark):
    """The defining CDF property: applying snapshot_changes' net
    changefeed to the snapshot-1 state (from snapshot_isolation_read)
    must reproduce the snapshot-2 state EXACTLY — delete removes the
    key, insert adds the new image, update replaces it."""
    from flights_etl_pipeline_spark.plans.queries_incremental import (
        snapshot_changes,
        snapshot_isolation_read,
    )

    states = {1: {}, 2: {}}
    for r in snapshot_isolation_read(spark, SF).collect():
        states[r["snapshot_id"]][r["c_custkey"]] = (
            r["c_acctbal"], r["c_mktsegment"],
        )
    replayed = dict(states[1])
    for r in snapshot_changes(spark, SF).collect():
        k = r["c_custkey"]
        if r["change_op"] == "delete":
            assert k in replayed, r
            assert (r["old_acctbal"], r["old_mktsegment"]) == replayed[k]
            del replayed[k]
        elif r["change_op"] == "insert":
            assert k not in replayed, r
            replayed[k] = (r["new_acctbal"], r["new_mktsegment"])
        else:
            assert k in replayed, r
            assert (r["old_acctbal"], r["old_mktsegment"]) == replayed[k]
            replayed[k] = (r["new_acctbal"], r["new_mktsegment"])
    assert replayed == states[2]


def test_changefeed_key_classes(spark):
    """Window-net semantics: delete-then-restore inside the window is
    an INSERT (the key was dead at the window start); a key untouched
    inside the window emits nothing."""
    from flights_etl_pipeline_spark.plans.queries_incremental import (
        snapshot_changes,
    )

    rows = {r["c_custkey"]: r for r in snapshot_changes(spark, SF).collect()}
    restored = [
        r for k, r in rows.items()
        if k % 13 == 0 and k % 3 == 0 and k < 10_000_000
    ]
    assert restored
    for r in restored:
        assert r["change_op"] == "insert", r
        assert r["old_acctbal"] is None and r["new_mktsegment"] == "RESTORED"
    deleted = [
        r for k, r in rows.items()
        if k % 11 == 0 and k % 13 != 0 and k < 10_000_000
    ]
    assert deleted
    for r in deleted:
        assert r["change_op"] == "delete", r
        assert r["new_acctbal"] is None and r["old_acctbal"] is not None
    untouched = [
        k for k in rows
        if k < 10_000_000 and all(k % m for m in (3, 5, 11, 13))
    ]
    assert not untouched, untouched[:5]


def test_ivm_maintained_view_equals_snapshot2_recompute(spark):
    """The maintenance theorem, checked against the INDEPENDENT read
    path: the delta-maintained per-segment aggregate must equal an
    aggregate recomputed from snapshot_isolation_read's snapshot-2
    rows — including groups born inside the window (UPDATED2 via
    update, RESTORED via insert-after-delete) and exact negative-
    retraction arithmetic on balance cents."""
    import math

    from flights_etl_pipeline_spark.plans.queries_incremental import (
        ivm_maintain_changefeed,
        snapshot_isolation_read,
    )

    recomputed: dict[str, list[int]] = {}
    for r in snapshot_isolation_read(spark, SF).collect():
        if r["snapshot_id"] != 2:
            continue
        n, cts = recomputed.setdefault(r["c_mktsegment"], [0, 0])
        recomputed[r["c_mktsegment"]] = [
            n + 1, cts + math.floor(r["c_acctbal"] * 100 + 0.5),
        ]
    maintained = {
        r["segment"]: [r["n_customers"], r["bal_cents"]]
        for r in ivm_maintain_changefeed(spark, SF).collect()
    }
    assert maintained == recomputed
    # the two window-born groups the append-only IVM could never emit
    assert "UPDATED2" in maintained and "RESTORED" in maintained


def test_ivm_retraction_actually_fires(spark):
    """The delta algebra must RETRACT, not just add: segments that lose
    members to gen-2 updates/deletes (the base TPC-H segments and gen-1
    'UPDATED') must shrink vs the snapshot-1 standing view."""
    from flights_etl_pipeline_spark.plans.queries_incremental import (
        ivm_maintain_changefeed,
        snapshot_isolation_read,
    )

    view1: dict[str, int] = {}
    for r in snapshot_isolation_read(spark, SF).collect():
        if r["snapshot_id"] == 1:
            view1[r["c_mktsegment"]] = view1.get(r["c_mktsegment"], 0) + 1
    after = {
        r["segment"]: r["n_customers"]
        for r in ivm_maintain_changefeed(spark, SF).collect()
    }
    shrunk = [s for s in view1 if after.get(s, 0) < view1[s]]
    assert "UPDATED" in shrunk and len(shrunk) >= 3, (view1, after)


def test_compaction_plan_matches_pure_python_replay(spark):
    """Third-implementation check: replay the bin-packing rule (task =
    floor(exclusive prefix sum / target) over file_id order per
    partition) in pure Python over the raw parquet and compare the
    task table EXACTLY — counts, bytes, ranges, flags."""
    import collections
    import math

    import pyarrow.parquet as pq

    from flights_etl_pipeline_spark.plans.queries_incremental import (
        _COMPACT_TARGET,
        compaction_plan_binpack,
    )

    tbl = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderdate",
                                         "o_totalprice"]
    ).to_pylist()
    per_part = collections.defaultdict(list)
    for r in tbl:
        d = r["o_orderdate"]
        month = d.date() if hasattr(d, "date") else d
        month = month.replace(day=1)
        per_part[month].append(
            (r["o_orderkey"], math.floor(r["o_totalprice"] * 100 + 0.5))
        )
    expected = {}
    for month, fs in per_part.items():
        fs.sort()
        cum = 0
        for fid, size in fs:
            task = math.floor(cum / float(_COMPACT_TARGET))
            key = (month, task)
            n, b, lo, hi = expected.get(key, (0, 0, fid, fid))
            expected[key] = (n + 1, b + size, min(lo, fid), max(hi, fid))
            cum += size
    got = {
        (r["part_month"], r["task_id"]): (
            r["n_files"], r["task_bytes"], r["first_file"], r["last_file"],
        )
        for r in compaction_plan_binpack(spark, SF).collect()
    }
    assert got == expected
    # small-files regime: every file below target => per partition the
    # task ids are contiguous from 0 and file ranges are disjoint
    assert all(
        s < _COMPACT_TARGET for fs in per_part.values() for _, s in fs
    )
    by_part = collections.defaultdict(list)
    for (month, task), (n, b, lo, hi) in sorted(got.items()):
        by_part[month].append((task, lo, hi))
    for month, tasks in by_part.items():
        assert [t for t, _, _ in tasks] == list(range(len(tasks))), month
        for (_, _, hi), (_, lo2, _) in zip(tasks, tasks[1:]):
            assert hi < lo2, month


def test_mor_read_matches_python_replay_and_seq_scoping(spark):
    """Replay the v2 delete semantics in pure Python over the raw
    parquet and match the per-segment aggregate exactly; additionally
    prove the SEQUENCE SCOPING is load-bearing — a %7 key in a
    data_seq-2 file survives the seq-2 equality delete while the same
    key class in a data_seq-1 file dies."""
    import collections
    import math

    import pyarrow.parquet as pq

    from flights_etl_pipeline_spark.plans.queries_incremental import (
        _MOR_FILES,
        mor_equality_deletes_read,
    )

    rows = pq.read_table(
        f"{SF}/customer.parquet",
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
    ).to_pylist()
    expected: dict[str, list] = collections.defaultdict(lambda: [0, 0, set()])
    survivors_by_scope = {1: 0, 2: 0}
    for r in rows:
        key = r["c_custkey"]
        file_id, pos = key % _MOR_FILES, key // _MOR_FILES
        data_seq = 2 if file_id >= _MOR_FILES // 2 else 1
        if key % 7 == 0 and data_seq < 2:
            continue
        if key % 13 == 0:
            continue
        if file_id in (1, 5) and pos % 10 == 0:
            continue
        if key % 7 == 0:
            survivors_by_scope[data_seq] += 1
        agg = expected[r["c_mktsegment"]]
        agg[0] += 1
        agg[1] += math.floor(r["c_acctbal"] * 100 + 0.5)
        agg[2].add(file_id)
    got = {
        r["segment"]: [r["n_live"], r["bal_cents"], r["n_files"]]
        for r in mor_equality_deletes_read(spark, SF).collect()
    }
    assert got == {
        s: [n, c, len(files)] for s, (n, c, files) in expected.items()
    }
    # scoping evidence: every surviving %7 key sits in a seq-2 file,
    # and such survivors exist at all
    assert survivors_by_scope[1] == 0 and survivors_by_scope[2] > 0


def test_partition_evolution_prunes_each_spec_on_its_own_bounds(spark):
    """The evolution contract, made measurable: day-grained spec-2
    files prune EXACTLY (selected files' rows are all in-range, and
    the selected set is precisely the days inside the predicate),
    while month-grained spec-1 files over-select on the range edge
    (the cut-off month is selected with rows_in_range < n_rows) —
    and no selected file is outside its transform-bound overlap."""
    import datetime as dt

    from flights_etl_pipeline_spark.plans.queries_incremental import (
        _EVO_FROM,
        _EVO_TO,
        partition_evolution_scan,
    )

    lo = dt.date.fromisoformat(_EVO_FROM)
    hi = dt.date.fromisoformat(_EVO_TO)
    rows = partition_evolution_scan(spark, SF).collect()
    assert rows
    sel2 = {r["part_value"] for r in rows if r["spec_id"] == 2 and r["selected"]}
    all2_in = {
        r["part_value"]
        for r in rows
        if r["spec_id"] == 2 and lo <= r["part_value"] < hi
    }
    assert sel2 == all2_in and sel2
    for r in rows:
        if r["spec_id"] == 2 and r["selected"]:
            assert r["rows_in_range"] == r["n_rows"], r
        if not r["selected"]:
            assert r["rows_in_range"] == 0, r
    edge = [
        r for r in rows
        if r["spec_id"] == 1 and r["selected"]
        and r["part_value"] == hi.replace(day=1)
    ]
    assert edge and all(r["rows_in_range"] < r["n_rows"] for r in edge)
    # exact-count conservation: selected files jointly contain every
    # in-range row (pruning never loses data)
    assert sum(r["rows_in_range"] for r in rows if r["selected"]) == sum(
        r["rows_in_range"] for r in rows
    )


def test_wap_gate_refuses_publication_with_exact_metrics(spark):
    """The audit must demonstrably refuse: on this corpus the staged
    gen-2 batch trips the tombstone and row-delta bounds (observed
    values replayed exactly in pure Python from the commit rules)
    while uniqueness and target-liveness pass, so publish reports
    exactly 2 failed gates."""
    import math

    import pyarrow.parquet as pq

    from flights_etl_pipeline_spark.plans.queries_incremental import (
        wap_audit_publish,
    )

    keys = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey"]
    ).column(0).to_pylist()
    upd = [k for k in keys if k % 5 == 0 and k % 11 and k % 13]
    dele = [k for k in keys if k % 11 == 0 and k % 13]
    ins = [k for k in keys if k % 13 == 0 and k % 3 == 0]
    n_batch = len(upd) + len(dele) + len(ins)
    live1 = {k for k in keys if k % 13} | {
        k + 10_000_000 for k in keys if k % 97 == 0
    }
    tomb = math.floor(1000.0 * len(dele) / n_batch)
    delta = math.floor(1000.0 * abs(len(ins) - len(dele)) / len(live1))
    got = {
        r["check_name"]: (r["observed"], r["passed"])
        for r in wap_audit_publish(spark, SF).collect()
    }
    assert got["batch_keys_unique"] == (0, True)
    assert got["mutation_targets_live"] == (0, True)
    assert got["tombstone_ratio_milli"] == (tomb, False) and tomb > 250
    assert got["row_delta_milli"] == (delta, False) and delta > 50
    assert got["publish"] == (2, False)


def _reference_changes(entries, f, t):
    """Pure-Python reference for the changefeed algebra: entries is
    {(key, gen): (bal, seg, op)}; returns {key: (change_op, old, new,
    gen_from, gen_to)} with old/new = (bal, seg) or None."""
    out = {}
    keys = {k for k, _ in entries}
    for key in keys:
        gens = sorted(g for k, g in entries if k == key)
        gf = max((g for g in gens if g <= f), default=None)
        gt = max((g for g in gens if g <= t), default=None)
        if gt is None or gt == gf:
            continue
        old = entries[(key, gf)] if gf is not None else None
        new = entries[(key, gt)]
        live_from = old is not None and old[2] != "D"
        live_to = new[2] != "D"
        if not (live_from or live_to):
            continue
        op = (
            "insert" if not live_from
            else "delete" if not live_to
            else "update"
        )
        out[key] = (
            op,
            (old[0], old[1]) if live_from else None,
            (new[0], new[1]) if live_to else None,
            gf,
            gt,
        )
    return out


def test_changes_between_property_random_logs(spark):
    """Property test: on randomized CDC logs (arbitrary key/gen
    sparsity, first-entry updates, delete-only keys, windows of every
    width including empty), _changes_between must match the pure-
    Python reference exactly — the algebra is not fixture-shaped."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flights_etl_pipeline_spark.plans.queries_incremental import (
        _changes_between,
    )

    entry = st.tuples(
        st.integers(0, 11),            # key
        st.integers(0, 3),             # gen
        st.floats(-100, 100, allow_nan=False, width=32),
        st.sampled_from(["A", "B", "C"]),
        st.sampled_from(["I", "U", "D"]),
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        raw=st.lists(entry, min_size=0, max_size=30),
        window=st.tuples(st.integers(-1, 3), st.integers(0, 4)),
    )
    def check(raw, window):
        f, t = window
        if f >= t:
            f, t = t - 1, t
        entries = {}
        for key, gen, bal, seg, op in raw:
            bal = float(round(bal, 2))
            entries[(key, gen)] = (
                (None, None, "D") if op == "D" else (bal, seg, op)
            )
        rows = [
            (k, bal, seg, g, op)
            for (k, g), (bal, seg, op) in entries.items()
        ]
        log = spark.createDataFrame(
            rows,
            "c_custkey long, c_acctbal double, c_mktsegment string, "
            "gen int, op string",
        )
        got = {
            r["c_custkey"]: (
                r["change_op"],
                (r["old_acctbal"], r["old_mktsegment"])
                if r["old_acctbal"] is not None
                or r["old_mktsegment"] is not None
                else None,
                (r["new_acctbal"], r["new_mktsegment"])
                if r["new_acctbal"] is not None
                or r["new_mktsegment"] is not None
                else None,
                r["gen_from"],
                r["gen_to"],
            )
            for r in _changes_between(log, f, t).collect()
        }
        assert got == _reference_changes(entries, f, t)

    check()


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
