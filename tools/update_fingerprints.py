#!/usr/bin/env python
"""Snapshot per-query source fingerprints into QUERY_FPRINTS.json.

Run at ROUND OPEN, before editing any query code (the committed tree at
round open is exactly the code the driver verified at the previous
round's end, so "current fingerprint" == "fingerprint the evidence was
gathered against").

Rules per registry query:
- latest driver-green round G (from CORRECTNESS_r*.json) exists and is
  newer than the stored snapshot round -> record the CURRENT
  fingerprint (fn source + oracle SQL + check mode, formula v2) with
  round G (the new evidence supersedes the old snapshot; it was
  gathered against this code).
- stored snapshot is current (round == G, same formula version) ->
  keep it verbatim, even if the live fingerprint differs (that
  difference IS the rewrite signal plans/queries._reorder_registry
  promotes on). A voided sentinel ("voided-by-mark-stale") is likewise
  kept until newer green evidence supersedes it — restamping it would
  silently erase the staleness mark.
- stored snapshot predates the current fingerprint FORMULA version ->
  restamp with the current fingerprint. Only valid at round open
  (tree == driver-verified tree), which the dirty-tree guard enforces.
- never green -> no entry (the never-green tier already leads).

--mark-stale a,b,c  force-voids the stored fingerprint for the named
queries (sentinel fp), used when a shared HELPER was rewritten so the
query fn's own source (the fingerprint input) did not change.

Snapshot validity depends on run ORDER (ADVICE r8): if this runs after
code edits in a round that also produced new green evidence, it would
stamp the post-edit source as "verified", silently erasing a rewrite
signal. Guard: refuse when the package tree is git-dirty (override with
--allow-dirty for a deliberate re-run), and record the HEAD commit in
every refreshed snapshot so a mis-ordered run is auditable after the
fact.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flights_etl_pipeline_spark.plans import queries as q  # noqa: E402
from flights_etl_pipeline_spark.plans.registry import REGISTRY  # noqa: E402

# paths whose edits change query-source fingerprints or their meaning
_FP_INPUT_PATHS = ["flights_etl_pipeline_spark", "__spark_entry__.py"]


def _tree_state(repo: str) -> tuple[str, bool]:
    """(short HEAD hash, fingerprint-input tree dirty?). Degrades to
    ("unknown", False) outside a git checkout rather than blocking."""
    try:
        head = subprocess.run(
            ["git", "-C", repo, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        dirty = bool(
            subprocess.run(
                ["git", "-C", repo, "status", "--porcelain", "--",
                 *_FP_INPUT_PATHS],
                capture_output=True, text=True, check=True,
            ).stdout.strip()
        )
        return head, dirty
    except (OSError, subprocess.CalledProcessError):
        return "unknown", False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mark-stale",
        default="",
        help="comma-separated query names whose stored fingerprint "
        "should be voided (helper rewrite, fn source unchanged)",
    )
    ap.add_argument(
        "--allow-dirty",
        action="store_true",
        help="snapshot even though the package tree has uncommitted "
        "edits (the stamped fingerprints then describe UNVERIFIED code)",
    )
    args = ap.parse_args()

    head, dirty = _tree_state(q._repo_root())
    if dirty and not args.allow_dirty:
        sys.exit(
            "refusing to snapshot: the fingerprint-input tree "
            f"({', '.join(_FP_INPUT_PATHS)}) has uncommitted edits, so "
            "current source is NOT the code the driver evidence was "
            "gathered against. Commit/stash first, or pass --allow-dirty "
            "if you really mean to stamp unverified source."
        )

    latest = q._driver_green(latest=True)
    stored = q._stored_fingerprints()
    out: dict[str, dict] = {}
    updated, kept = 0, 0
    for name in sorted(REGISTRY):
        g = latest.get(name)
        if g is None:
            continue
        rec = stored.get(name)
        same_round = bool(rec) and rec.get("round") == g
        voided = bool(rec) and rec.get("fp") == "voided-by-mark-stale"
        current_formula = bool(rec) and rec.get("v") == q._FP_VERSION
        if same_round and (current_formula or voided):
            out[name] = rec
            kept += 1
        else:
            out[name] = {
                "fp": q._source_fingerprint(REGISTRY[name]),
                "round": g,
                "commit": head,
                "v": q._FP_VERSION,
            }
            updated += 1
    for name in filter(None, args.mark_stale.split(",")):
        if name not in out:
            print(f"warn: --mark-stale {name}: no stored snapshot", file=sys.stderr)
            continue
        out[name] = {"fp": "voided-by-mark-stale", "round": out[name]["round"]}

    path = os.path.join(q._repo_root(), q._FPRINT_FILE)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"{path}: {len(out)} snapshots ({updated} updated, {kept} kept)")


if __name__ == "__main__":
    main()
