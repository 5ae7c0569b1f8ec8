"""_min_label_propagate: shared connected-components helper."""

from __future__ import annotations

import warnings

import pytest


def _chain_pairs(spark, n):
    # path graph 0-1-2-...-n: diameter n, worst case for propagation
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a LONG, b LONG"
    )


def test_chain_converges_to_single_component(spark):
    from flights_etl_pipeline_spark.plans.queries_dedup import (
        _min_label_propagate,
    )

    labels = _min_label_propagate(_chain_pairs(spark, 6)).collect()
    assert len(labels) == 7
    assert {r["comp"] for r in labels} == {0}


def test_round_cap_warns_instead_of_silent_partial(spark):
    from flights_etl_pipeline_spark.plans.queries_dedup import (
        _min_label_propagate,
    )

    with pytest.warns(RuntimeWarning, match="without converging"):
        labels = _min_label_propagate(
            _chain_pairs(spark, 8), max_rounds=2
        ).collect()
    # partial labels really are partial -- the far end of the chain
    # has not seen label 0 yet
    assert {r["comp"] for r in labels} != {0}


def test_converged_run_does_not_warn(spark):
    from flights_etl_pipeline_spark.plans.queries_dedup import (
        _min_label_propagate,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        _min_label_propagate(_chain_pairs(spark, 3)).collect()
