#!/usr/bin/env python
"""Round-open protocol, one command: run this FIRST each round, before
editing any query code (the committed tree at round open is exactly the
code the driver verified at the previous round's end — the window in
which fingerprint snapshots are valid).

1. tools/update_fingerprints.py — snapshot per-query source
   fingerprints against the latest driver-green evidence
   (QUERY_FPRINTS.json); pass --mark-stale for helper-only rewrites.
2. tools/gen_coverage.py — regenerate COVERAGE.md so its driver-green
   header reflects the newest CORRECTNESS_r*.json (the r6/r7 verdicts
   both flagged a one-round header lag).

Usage: python tools/round_open.py [--mark-stale q1,q2]
"""

from __future__ import annotations

import subprocess
import sys
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    args = sys.argv[1:]
    steps = [
        [sys.executable, os.path.join(HERE, "update_fingerprints.py"), *args],
        [sys.executable, os.path.join(HERE, "gen_coverage.py")],
    ]
    for cmd in steps:
        print("+", " ".join(os.path.basename(c) for c in cmd[1:2]) or cmd[1])
        subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
