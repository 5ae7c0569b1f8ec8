#!/usr/bin/env python
"""Snapshot per-query source fingerprints into QUERY_FPRINTS.json.

Run at ROUND OPEN, before editing any query code (the committed tree at
round open is exactly the code the driver verified at the previous
round's end, so "current fingerprint" == "fingerprint the evidence was
gathered against").

Rules per registry query:
- latest driver-green round G (from CORRECTNESS_r*.json) exists and is
  newer than the stored snapshot round -> record the CURRENT source
  fingerprint with round G (the new evidence supersedes the old
  snapshot; it was gathered against this code).
- stored snapshot is current (round == G) -> keep it verbatim, even if
  the live fingerprint differs (that difference IS the rewrite signal
  plans/queries._reorder_registry promotes on).
- never green -> no entry (the never-green tier already leads).

--mark-stale a,b,c  force-voids the stored fingerprint for the named
queries (sentinel fp), used when a shared HELPER was rewritten so the
query fn's own source (the fingerprint input) did not change.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flights_etl_pipeline_spark.plans import queries as q  # noqa: E402
from flights_etl_pipeline_spark.plans.registry import REGISTRY  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mark-stale",
        default="",
        help="comma-separated query names whose stored fingerprint "
        "should be voided (helper rewrite, fn source unchanged)",
    )
    args = ap.parse_args()

    latest = q._driver_green(latest=True)
    stored = q._stored_fingerprints()
    out: dict[str, dict] = {}
    updated, kept = 0, 0
    for name in sorted(REGISTRY):
        g = latest.get(name)
        if g is None:
            continue
        rec = stored.get(name)
        if rec and rec.get("round") == g:
            out[name] = rec
            kept += 1
        else:
            out[name] = {
                "fp": q._source_fingerprint(REGISTRY[name].fn),
                "round": g,
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
