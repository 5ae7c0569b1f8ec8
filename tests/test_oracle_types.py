"""Static type-check of every DuckDB oracle: no HUGEINT may reach the
result surface.

DuckDB's SUM over any integer column returns HUGEINT, which exports as
float64 through Arrow (the driver's hash path) while Spark returns
BIGINT -- the exact mechanism behind every hash_match=false row in
round 1 (duration_agg, events_sessionize, events_json_stats). Each was
fixed with CAST(... AS BIGINT); this test makes the whole CLASS of bug
impossible to reintroduce: it plans every registered oracle against the
real tables and asserts no result column is HUGEINT (or its unsigned
twin)."""

from __future__ import annotations

import duckdb
import pytest

from flights_etl_pipeline_spark.plans import queries as q
from flights_etl_pipeline_spark.plans.registry import REGISTRY, TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def test_no_oracle_returns_hugeint(con):
    offenders = {}
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        rel = con.sql(spec.oracle)
        bad = [
            (col, str(typ))
            for col, typ in zip(rel.columns, rel.types)
            if str(typ) in ("HUGEINT", "UHUGEINT")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles returning HUGEINT (will hash-mismatch vs Spark BIGINT "
        f"through the driver's Arrow path): {offenders}"
    )
