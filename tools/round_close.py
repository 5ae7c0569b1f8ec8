#!/usr/bin/env python
"""Round-close protocol (VERDICT r8 item 3), one command: run this LAST
each round, after the final code/test commit, so the recorded green-suite
numbers describe the tree that actually ships.

1. Refuses on a dirty tree — the sweep must describe a commit.
2. Full `bench.py` FIRST (while the machine is still quiet — pytest
   heats it ~25%), persisting the FULL per-query record as
   BENCH_LOCAL_r{N}.json (VERDICT r9 item 2a: the driver keeps only a
   ~2 KB tail, so without this the per-round comparison needs a full
   re-run). Pass --skip-bench to reuse an existing BENCH_LOCAL_r{N}.json.
3. Full `pytest tests/ -q` and full `tools/check_parity.py` sweep.
4. Appends a "Final-tree verification" block to SCALE.md and refreshes
   README.md's parity counts, stamped with the audited commit hash.

The doc updates then go in one final DOC-ONLY commit, so the recorded
counts remain true of the shipped code tree (round 8's failure mode was
test commits landing AFTER the recorded sweep).

Usage: python tools/round_close.py <round-number> [--skip-bench]
"""

from __future__ import annotations

import json
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


def _run_bench(rnd: int) -> str:
    """Run bench.py on the (still-quiet) machine and persist the FULL
    per-query record — queries dict + sf1_spot bands — as
    BENCH_LOCAL_r{rnd}.json. Returns a one-line summary."""
    out = _run([sys.executable, "bench.py"])
    full = None
    for ln in out.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                doc = json.loads(ln)
            except Exception:
                continue
            if isinstance(doc.get("queries"), dict):
                full = doc
                break
    if full is None:
        sys.exit("bench.py produced no full JSON record")
    path = os.path.join(REPO, f"BENCH_LOCAL_r{rnd}.json")
    with open(path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    drift = [
        ln for ln in out.splitlines() if "SLOPE DRIFT" in ln or "DRIFTED" in ln
    ]
    for ln in drift:
        print(ln, flush=True)
    return (
        f"bench total {full['value']}s / {len(full['queries'])} queries "
        f"(full record: BENCH_LOCAL_r{rnd}.json"
        + (f"; {len(drift) - 1} slope drifts flagged)" if drift else ")")
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip_bench = "--skip-bench" in sys.argv
    if len(args) != 1:
        sys.exit("usage: round_close.py <round-number> [--skip-bench]")
    rnd = int(args[0])

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

    if skip_bench:
        if not os.path.exists(
            os.path.join(REPO, f"BENCH_LOCAL_r{rnd}.json")
        ):
            sys.exit(f"--skip-bench but BENCH_LOCAL_r{rnd}.json is missing")
        bench_line = f"bench reused (BENCH_LOCAL_r{rnd}.json)"
    else:
        bench_line = _run_bench(rnd)

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
    print(f"bench  : {bench_line}")
    print(f"pytest : {pytest_line}")
    print(f"parity : {parity_line}")
    print(f"commit : {commit}")
    print("SCALE.md/README.md/BENCH_LOCAL updated — commit them as the")
    print("round's final, doc-only commit.")


if __name__ == "__main__":
    main()
