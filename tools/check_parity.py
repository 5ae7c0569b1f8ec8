"""Local emulation of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle over the same
parquet dir, then compares row count, column names, and (order-insensitive)
values. Exact for non-floats; floats compare bit-exact first, then with
1e-9 relative tolerance as a diagnostic.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from flights_etl_pipeline_spark.plans import queries as q
from flights_etl_pipeline_spark.plans.registry import REGISTRY, TABLES
from flights_etl_pipeline_spark.session import get_spark


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
        return _norm(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows(cols, data):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in idx) for r in data),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )


def _close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(_close(x, y) for x, y in zip(a, b))
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, spec in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"     WARN {name}: 0 rows")
            continue
        try:
            rel = con.sql(spec.oracle)
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ok = True
        if sorted(c.lower() for c in scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            ok = False
        else:
            a = _rows([c.lower() for c in scols], [tuple(r) for r in srows])
            b = _rows(ocols, orows)
            if a != b:
                n_exact = sum(1 for x, y in zip(a, b) if x == y)
                n_close = sum(1 for x, y in zip(a, b) if _close(x, y))
                print(
                    f"FAIL {name}: values differ "
                    f"(exact {n_exact}/{len(a)}, close {n_close}/{len(a)})"
                )
                for x, y in zip(a, b):
                    if not _close(x, y):
                        print(f"     spark : {x}\n     oracle: {y}")
                        break
                ok = False
        if ok:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"     WARN {name}: 0 rows")
        else:
            failures.append(name)

    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
