"""Dump explain("formatted") for named queries into plans/r<N>/
(N from $SPARK_GRAFT_ROUND, default 13).

Optimization-round evidence: for each named query, writes
``plans/r<N>/<query>_<tag>.txt`` (tag = before/after) with the formatted
physical plan at sf0.001, under plan-audit mode so checkpoint-returning
queries expose their real operator tree (same convention as
tools/gen_explains.py). Driver-side iterative queries (kmeans, PCA,
label propagation) show the plan of the RETURNED DataFrame — the final
pass — which is the shape their per-round jobs share.

Usage: python tools/opt_explain.py <tag> query [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from flights_etl_pipeline_spark.plans import queries as q
    from flights_etl_pipeline_spark.plans.registry import plan_audit_mode
    from flights_etl_pipeline_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    outdir = os.path.join(
        REPO, "plans", f"r{os.environ.get('SPARK_GRAFT_ROUND', '13')}"
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("opt-explain")
    qs = q.queries()
    for name in names:
        with plan_audit_mode():
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
