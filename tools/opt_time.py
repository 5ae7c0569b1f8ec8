"""Per-query timing harness for the optimization rounds.

Times named registered queries (default: the bench set) end-to-end with
the noop sink — same methodology as bench.py (_N_RUNS runs, median via
the same upper-median-for-even-n convention `runs[len//2]`, cache
cleared between runs, SESSION warmup excluded; each query's first run
still pays its own plan-compilation like bench.py's does) — without
paying for the whole 53-query sweep. Used for before/after A/B evidence
while iterating; the committed record stays bench.py's.

Usage: python tools/opt_time.py [--sf DIR] [--runs N] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flights_etl_pipeline_spark.plans.queries import queries
from flights_etl_pipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("opt-time")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    qs = queries()
    out = {}
    for name in args.names:
        fn = qs[name]
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        runs.sort()
        out[name] = {"median": runs[len(runs) // 2], "runs": runs}
        print(f"{name}: median={runs[len(runs) // 2]} runs={runs}",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
