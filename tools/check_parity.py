"""Local emulation of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle over the same
parquet dir, then compares row count, column names, and (order-insensitive)
values. Exact for non-floats; floats compare bit-exact first, then with
1e-9 relative tolerance as a diagnostic.

The oracle side is fetched through Arrow (``rel.arrow()``), matching the
driver's hash path: DuckDB HUGEINT (the result type of SUM over any
integer column) exports as float64 there, so an oracle missing a
``CAST(... AS BIGINT)`` fails here exactly as it fails the driver's
hash_match -- ``fetchall()`` would hide it by returning Python ints.
(Arrow, not pandas: r1 driver rows show DATE stays date and nullable
int stays int -- pandas would float both; only HUGEINT goes float.)
Comparison is type-strict for int-vs-float (21168869 != 21168869.0).

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
import numpy as np
import pandas as pd

from flights_etl_pipeline_spark.plans import queries as q
from flights_etl_pipeline_spark.plans.registry import REGISTRY, TABLES
from flights_etl_pipeline_spark.session import get_spark


def _norm(v):
    if v is None:
        return None
    if isinstance(v, np.ndarray):  # duckdb LIST via pandas
        return tuple(_norm(x) for x in v.tolist())
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if v is getattr(pd, "NaT", object()):
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


def _strict_eq(a, b):
    """Type-strict equality: int 3 != float 3.0 (mirrors the driver hash)."""
    if type(a) is not type(b):
        return False
    if isinstance(a, tuple):
        return len(a) == len(b) and all(_strict_eq(x, y) for x, y in zip(a, b))
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
            tbl = rel.arrow()  # arrow path: HUGEINT -> float64, like the driver
            names = tbl.column_names
            ocols = [c.lower() for c in names]
            orows = [tuple(d[c] for c in names) for d in tbl.to_pylist()]
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
            if not all(_strict_eq(x, y) for x, y in zip(a, b)):
                n_exact = sum(1 for x, y in zip(a, b) if _strict_eq(x, y))
                n_close = sum(1 for x, y in zip(a, b) if _close(x, y))
                print(
                    f"FAIL {name}: values differ "
                    f"(exact {n_exact}/{len(a)}, close {n_close}/{len(a)})"
                )
                for x, y in zip(a, b):
                    if not _strict_eq(x, y):
                        kind = "value" if not _close(x, y) else "TYPE-ONLY"
                        print(f"     [{kind}] spark : {x}\n     {' ' * len(kind)}  oracle: {y}")
                        break
                ok = False
        if ok:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"     WARN {name}: 0 rows")
        else:
            failures.append(name)

    n_run = len([n for n in REGISTRY if not only or n in only])
    print(f"\n{n_run - len(failures)}/{n_run} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
