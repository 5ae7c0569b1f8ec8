"""Guard the driver-sample rotation (plans/queries._reorder_registry).

The grading driver hash-checks roughly the first ~50 registry entries
per round, so the ordering IS the verification budget. Since round 6
the tiers are DERIVED from the CORRECTNESS_r*.json files the driver
writes (plans/queries._driver_green) instead of hand-kept lists, so
these tests pin the derivation and the resulting order:

- queries with no green driver row lead the registry, hash-checkable
  (oracle-backed) ones before rows-only ones;
- green queries whose source fingerprint no longer matches the
  at-last-green snapshot (QUERY_FPRINTS.json) are REWRITTEN: their
  evidence is void and they outrank every still-valid green query
  (VERDICT r7 item 1);
- still-valid green queries sit strictly behind every fresh/rewritten
  query and are ordered oldest-evidence-first so leftover budget
  re-verifies the stalest rows;
- the derivation reads real driver artifacts: every name it returns
  must exist in the registry (or be an env-gated registration), and a
  green row must actually be green in the source JSON.
"""

from __future__ import annotations

import glob
import json
import os

from flights_etl_pipeline_spark.plans.queries import (
    _driver_green,
    _rewritten,
    _source_fingerprint,
    _stored_fingerprints,
)
from flights_etl_pipeline_spark.plans.registry import REGISTRY

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries registered only when an optional dependency is present; the
# driver record may legitimately name them in environments where they
# don't register.
_ENV_GATED = {"events_user_stats_stream"}  # needs protobuf (Spark 4 tws)


def _tiers():
    names = list(REGISTRY)
    green = _driver_green()
    rewritten = _rewritten(green)
    fresh = [n for n in names if n not in green]
    checked = [n for n in names if n in green and n not in rewritten]
    return names, green, rewritten, fresh, checked


def test_fresh_queries_lead_the_registry():
    names, green, rewritten, fresh, checked = _tiers()
    fresh_hash = [n for n in fresh if REGISTRY[n].oracle is not None]
    assert set(names[: len(fresh_hash)]) == set(fresh_hash), (
        "oracle-backed never-verified queries must occupy the first "
        "positions of the registry"
    )


def test_rewritten_outrank_every_valid_green_query():
    """VERDICT r7 item 1: a query whose implementation changed since
    its last driver-green must jump ahead of all still-valid green
    queries (its evidence predates the rewrite)."""
    names, green, rewritten, fresh, checked = _tiers()
    if not rewritten or not checked:
        return
    pos = {n: i for i, n in enumerate(names)}
    assert max(pos[n] for n in rewritten) < min(pos[c] for c in checked)


def test_rows_only_fresh_sit_before_checked():
    names, green, rewritten, fresh, checked = _tiers()
    pos = {n: i for i, n in enumerate(names)}
    fresh_hash = [n for n in fresh if REGISTRY[n].oracle is not None]
    rows_only = [n for n in fresh if REGISTRY[n].oracle is None]
    for n in rows_only:
        if fresh_hash:
            assert pos[n] > max(pos[f] for f in fresh_hash), n
        if checked:
            assert pos[n] < min(pos[c] for c in checked), n


def test_checked_ordered_oldest_evidence_first():
    names, green, rewritten, fresh, checked = _tiers()
    rounds = [green[n] for n in checked]
    assert rounds == sorted(rounds), (
        "still-valid green queries must be ordered by earliest green "
        "round so stale evidence is re-verified first"
    )


def test_fingerprint_detects_source_edit():
    """The rewrite signal: same spec -> same fp; different source -> a
    different fp; an edited fn must land in the rewritten set."""
    from flights_etl_pipeline_spark.plans.registry import QuerySpec

    name = next(iter(REGISTRY))
    spec = REGISTRY[name]
    assert _source_fingerprint(spec) == _source_fingerprint(spec)

    def other(spark, sf_dir):  # distinct source text
        return None

    assert _source_fingerprint(spec) != _source_fingerprint(
        QuerySpec(fn=other, oracle=spec.oracle)
    )


def test_fingerprint_detects_oracle_edit():
    """VERDICT r11 item 2, reproducing the round-11 funnel scenario:
    an ORACLE-ONLY edit (fn source unchanged) must change the
    fingerprint, so stale driver-green evidence is auto-voided and the
    query re-enters the verification queue without a manual
    --mark-stale. Switching a query between hash-checked and rows-only
    mode must likewise void the snapshot."""
    from flights_etl_pipeline_spark.plans.registry import QuerySpec

    def fn(spark, sf_dir):
        return None

    a = QuerySpec(fn=fn, oracle="SELECT 1 AS x")
    edited = QuerySpec(fn=fn, oracle="SELECT CAST(1 AS DOUBLE) AS x")
    rows_only = QuerySpec(fn=fn, oracle=None)
    assert _source_fingerprint(a) != _source_fingerprint(edited)
    assert _source_fingerprint(a) != _source_fingerprint(rows_only)


def test_oracle_edit_invalidates_snapshot_end_to_end(monkeypatch):
    """The full round-11 funnel path, mechanized: a query with a
    stored at-green snapshot whose ORACLE is then edited must be
    reported rewritten by _rewritten() with no manual intervention."""
    from dataclasses import replace

    import flights_etl_pipeline_spark.plans.queries as q

    name = next(n for n in REGISTRY if REGISTRY[n].oracle is not None)
    spec = REGISTRY[name]
    snapshot = {name: {"fp": _source_fingerprint(spec), "round": 11,
                       "v": q._FP_VERSION}}
    monkeypatch.setattr(q, "_stored_fingerprints", lambda: snapshot)
    assert name not in q._rewritten({name: 11})

    edited = replace(spec, oracle=spec.oracle + " -- oracle-only edit")
    monkeypatch.setitem(REGISTRY, name, edited)
    assert name in q._rewritten({name: 11})


def test_stored_fingerprints_cover_all_green_queries():
    """QUERY_FPRINTS.json must be regenerated at round open: every
    query with driver-green evidence needs a snapshot row (else it is
    treated as rewritten forever and starves the stale-green tier)."""
    stored = _stored_fingerprints()
    if not stored:  # fresh clone without the snapshot
        return
    green = _driver_green()
    missing = [n for n in green if n in REGISTRY and n not in stored]
    assert not missing, (
        f"green queries without a fingerprint snapshot (run "
        f"tools/update_fingerprints.py at round open): {missing}"
    )


def test_driver_green_names_exist_in_registry():
    unknown = [
        n for n in _driver_green() if n not in REGISTRY and n not in _ENV_GATED
    ]
    assert not unknown, (
        f"driver record names absent from the registry (rename without "
        f"rotation update?): {unknown}"
    )


def test_driver_green_rows_are_actually_green():
    """Spot-check the derivation against the raw JSON: a name returned
    by _driver_green must have at least one row that is hash_match true
    or a rows-only run, and the reported round must contain it."""
    green = _driver_green()
    if not green:  # fresh clone without driver artifacts
        return
    byround: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        with open(path) as fh:
            byround[rnd] = json.load(fh)
    for name, rnd in green.items():
        row = byround[rnd][name]
        assert row.get("hash_match") is True or (
            row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0
        ), (name, rnd, row)


def test_update_fingerprints_rules(tmp_path, monkeypatch):
    """tools/update_fingerprints.py update rules: new green evidence
    refreshes a snapshot to the CURRENT fp; a current-round snapshot is
    kept VERBATIM (the live-vs-stored diff is the rewrite signal, the
    tool must not overwrite it); --mark-stale voids a snapshot."""
    import importlib
    import json
    import sys

    from flights_etl_pipeline_spark.plans import queries as q

    tool = importlib.import_module("tools.update_fingerprints")

    names = list(REGISTRY)[:3]
    a, b, c = names[0], names[1], names[2]
    fpath = tmp_path / "QUERY_FPRINTS.json"
    fpath.write_text(json.dumps({
        a: {"fp": "stale-old-evidence", "round": 7},
        b: {"fp": "kept-snapshot", "round": 8, "v": q._FP_VERSION},
        # c: current round but PRE-v2 record (no "v") -> the formula
        # migration restamps it (VERDICT r11 item 2 rollout path)
        c: {"fp": "v1-formula-hash", "round": 8},
    }))
    monkeypatch.setattr(q, "_repo_root", lambda: str(tmp_path))
    monkeypatch.setattr(
        q, "_driver_green", lambda latest=False: {a: 8, b: 8, c: 8}
    )
    monkeypatch.setattr(tool, "_tree_state", lambda repo: ("abc1234", False))
    monkeypatch.setattr(sys, "argv", ["update_fingerprints.py"])
    tool.main()
    out = json.loads(fpath.read_text())
    # a: new green round (8 > stored 7) -> refreshed to current fp,
    # stamped with the commit the evidence describes (ADVICE r8)
    assert out[a] == {
        "fp": q._source_fingerprint(REGISTRY[a]),
        "round": 8,
        "commit": "abc1234",
        "v": q._FP_VERSION,
    }
    # b: evidence round unchanged, current formula -> kept verbatim
    assert out[b] == {"fp": "kept-snapshot", "round": 8, "v": q._FP_VERSION}
    # c: evidence round unchanged but old formula -> restamped
    assert out[c] == {
        "fp": q._source_fingerprint(REGISTRY[c]),
        "round": 8,
        "commit": "abc1234",
        "v": q._FP_VERSION,
    }

    monkeypatch.setattr(
        sys, "argv", ["update_fingerprints.py", "--mark-stale", b]
    )
    tool.main()
    out = json.loads(fpath.read_text())
    assert out[b]["fp"] == "voided-by-mark-stale"
    assert out[a]["fp"] == q._source_fingerprint(REGISTRY[a])

    # a voided sentinel survives subsequent re-runs until newer green
    # evidence lands (restamping would erase the staleness mark)
    monkeypatch.setattr(sys, "argv", ["update_fingerprints.py"])
    tool.main()
    out = json.loads(fpath.read_text())
    assert out[b]["fp"] == "voided-by-mark-stale"


def test_update_fingerprints_refuses_dirty_tree(tmp_path, monkeypatch):
    """A dirty fingerprint-input tree means current source is NOT what
    the driver verified — the tool must refuse to stamp it (ADVICE r8)
    unless --allow-dirty is explicit."""
    import importlib
    import json
    import sys

    import pytest

    from flights_etl_pipeline_spark.plans import queries as q

    tool = importlib.import_module("tools.update_fingerprints")

    name = next(iter(REGISTRY))
    fpath = tmp_path / "QUERY_FPRINTS.json"
    monkeypatch.setattr(q, "_repo_root", lambda: str(tmp_path))
    monkeypatch.setattr(q, "_driver_green", lambda latest=False: {name: 8})
    monkeypatch.setattr(tool, "_tree_state", lambda repo: ("abc1234", True))

    monkeypatch.setattr(sys, "argv", ["update_fingerprints.py"])
    with pytest.raises(SystemExit, match="refusing to snapshot"):
        tool.main()
    assert not fpath.exists()

    monkeypatch.setattr(
        sys, "argv", ["update_fingerprints.py", "--allow-dirty"]
    )
    tool.main()
    assert name in json.loads(fpath.read_text())
