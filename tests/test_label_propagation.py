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


def test_random_graphs_match_union_find(spark):
    """Property check: on random edge lists the distributed min-label
    propagation must produce exactly the components a pure-Python
    union-find derives (comp = min node id of the component). Guards
    the r8 rewrite (Observation-merged convergence + min(id, neighbor)
    seeding) against correctness drift on non-clique shapes."""
    import random

    from flights_etl_pipeline_spark.plans.queries_dedup import (
        _min_label_propagate,
    )

    rng = random.Random(0xC0FFEE)
    for _ in range(4):
        n_nodes = rng.randint(2, 12)
        n_edges = rng.randint(1, 14)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]

        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {v for e in edges for v in e}
        want = {}
        for v in touched:
            root = find(v)
            comp = min(u for u in touched if find(u) == root)
            want[v] = comp

        df = spark.createDataFrame(edges, "a LONG, b LONG")
        got = {
            r["id"]: r["comp"]
            for r in _min_label_propagate(df).collect()
        }
        assert got == want, (edges, got, want)
