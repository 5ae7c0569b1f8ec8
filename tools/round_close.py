#!/usr/bin/env python
"""Round-close protocol (VERDICT r8 item 3), one command: run this LAST
each round, after the final code/test commit, so the recorded green-suite
numbers describe the tree that actually ships.

1. Refuses on a dirty tree — the sweep must describe a commit.
2. Full `pytest tests/ -q` and full `tools/check_parity.py` sweep.
3. Appends a "Final-tree verification" block to SCALE.md and refreshes
   README.md's parity counts, stamped with the audited commit hash.

The doc updates then go in one final DOC-ONLY commit, so the recorded
counts remain true of the shipped code tree (round 8's failure mode was
test commits landing AFTER the recorded sweep).

Usage: python tools/round_close.py <round-number>
"""

from __future__ import annotations

import re
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str]) -> str:
    print("+", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    out = proc.stdout + proc.stderr
    if proc.returncode != 0:
        tail = "\n".join(out.splitlines()[-25:])
        sys.exit(f"FAILED ({proc.returncode}): {' '.join(cmd)}\n{tail}")
    return out


def main() -> None:
    if len(sys.argv) != 2:
        sys.exit("usage: round_close.py <round-number>")
    rnd = int(sys.argv[1])

    dirty = subprocess.run(
        ["git", "-C", REPO, "status", "--porcelain"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    if dirty:
        sys.exit(
            "refusing to sweep a dirty tree — commit everything first so "
            "the recorded counts describe the shipped commit:\n" + dirty
        )
    commit = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    pytest_out = _run([sys.executable, "-m", "pytest", "tests/", "-q"])
    pytest_line = next(
        ln for ln in reversed(pytest_out.splitlines())
        if re.search(r"\d+ passed", ln)
    ).strip().strip("=").strip()
    if re.search(r"\d+ (failed|error)", pytest_line):
        sys.exit(f"suite is RED — fix before closing the round: {pytest_line}")

    parity_out = _run([sys.executable, "tools/check_parity.py"])
    parity_line = next(
        ln for ln in reversed(parity_out.splitlines())
        if re.search(r"\d+/\d+ queries", ln)
    ).strip()
    m = re.match(r"(\d+)/(\d+) queries pass", parity_line)
    if not m or m.group(1) != m.group(2):
        sys.exit(f"parity is RED — fix before closing the round: {parity_line}")
    n_queries = m.group(2)

    block = (
        f"\n**Final-tree verification (round {rnd}, commit {commit})** — "
        f"run by tools/round_close.py on the committed tree, AFTER the "
        f"round's last code/test commit: `pytest tests/`: {pytest_line}; "
        f"oracle parity sweep: {parity_line} at sf0.01.\n"
    )
    with open(os.path.join(REPO, "SCALE.md"), "a") as fh:
        fh.write(block)

    readme_path = os.path.join(REPO, "README.md")
    with open(readme_path) as fh:
        readme = fh.read()
    readme = re.sub(
        r"`tools/check_parity\.py`, \d+/\d+ — also\n\d+/\d+ at",
        f"`tools/check_parity.py`, {n_queries}/{n_queries} — also\n"
        f"{n_queries}/{n_queries} at",
        readme,
    )
    with open(readme_path, "w") as fh:
        fh.write(readme)

    print()
    print(f"pytest : {pytest_line}")
    print(f"parity : {parity_line}")
    print(f"commit : {commit}")
    print("SCALE.md/README.md updated — commit them as the round's final,")
    print("doc-only commit.")


if __name__ == "__main__":
    main()
