"""Smoke: every registered query runs at sf0.001 and yields a stable schema.

Full value-level verification against DuckDB lives in tools/check_parity.py
(and the driver's own gate at sf0.01); these tests catch import errors,
analysis exceptions, and empty results early.
"""

from __future__ import annotations

import pytest

from flights_etl_pipeline_spark.plans.queries import oracle_sql, queries
from flights_etl_pipeline_spark.plans.registry import REGISTRY

# queries where an empty result at the tiny sf0.001 scale is legitimate
# sf0.001's supplier table is too sparse for any |Δbal| < 10 pair to
# exist (the band predicate is the point of the query, not its hit
# rate); sf0.01 — the driver's correctness SF — yields 7 matched rows
MAY_BE_EMPTY: set[str] = {"acctbal_band_pairs"}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    rows = df.collect()
    assert df.columns, name
    if name not in MAY_BE_EMPTY:
        assert len(rows) > 0, f"{name} returned 0 rows at sf0.001"


def test_oracle_keys_subset_of_queries():
    assert set(oracle_sql()) <= set(queries())


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.columns) >= 2
    assert df.count() > 0
