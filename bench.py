"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect -- the number measures the distributed plan, not the
driver's result transfer). Session startup is excluded: the clock starts
after a warmup action.
"""

from __future__ import annotations

import json
import re
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flights_etl_pipeline_spark.plans.queries import bench_queries
from flights_etl_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    spark = get_spark("bench")

    # warmup: JVM + parquet footer reads + Python/Arrow worker pool spawn
    # (pandas-UDF queries otherwise pay worker startup on first use),
    # excluded from timings
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, fn in sorted(bench_queries().items()):
        # min of 2 runs: the first pays one-time Janino codegen compile for
        # this plan shape and absorbs background-noise spikes; min-of-k is
        # the standard steady-state estimator
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            # queries that persist intermediates (minhash signatures,
            # shingle tables) must not bleed executor memory into the
            # next measurement
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    _report_deltas(timings)


def _baseline() -> tuple[int, dict[str, float]] | None:
    """Latest driver-recorded BENCH_r{N}.json at the repo root."""
    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, dict[str, float]] | None = None
    for f in os.listdir(here):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", f)
        if not m:
            continue
        try:
            doc = json.load(open(os.path.join(here, f)))
            qs = doc["parsed"]["queries"]
        except Exception:
            continue
        rnd = int(m.group(1))
        if best is None or rnd > best[0]:
            best = (rnd, qs)
    return best


def _report_deltas(timings: dict[str, float]) -> None:
    """Per-query regression report vs the latest recorded round
    (stderr only -- stdout stays the single JSON line)."""
    base = _baseline()
    if base is None:
        return
    rnd, prev = base
    flagged = []
    for name, sec in sorted(timings.items()):
        p = prev.get(name)
        if p is None:
            print(f"bench-delta r{rnd}: {name} NEW {sec:.3f}s", file=sys.stderr)
            continue
        ratio = sec / p if p else float("inf")
        mark = "  <-- REGRESSION >2x" if ratio > 2.0 else ""
        print(
            f"bench-delta r{rnd}: {name} {p:.3f}s -> {sec:.3f}s "
            f"({ratio:.2f}x){mark}",
            file=sys.stderr,
        )
        if ratio > 2.0:
            flagged.append(name)
    if flagged:
        print(f"bench-delta r{rnd}: FLAGGED {flagged}", file=sys.stderr)


if __name__ == "__main__":
    main()
